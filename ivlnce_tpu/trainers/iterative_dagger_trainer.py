"""Tour-ordered DAgger training (latent memory models).

Reference: ivlnce_baselines/trainers/iterative_dagger_trainer.py. The RNN
hidden state flows across consecutive batches of the same binpacked tour
lanes (truncated BPTT at batch granularity, :218-253); episodic slots
reset each batch unless tour memory is configured; the tour-memory slot
persists and is re-masked by tour_not_done flags inside the net.
"""

from __future__ import annotations

import numpy as np

from ivlnce_tpu.trainers.dagger_trainer import IWTrajectoryDataset  # noqa: F401
from ivlnce_tpu.trainers.iterative_collection_dagger_trainer import (
    IterativeCollectionDaggerTrainer,
)
from ivlnce_tpu.trainers.tour_dataset import (
    TourSampler,
    TourTrajectoryDataset,
)
from ivlnce_tpu.trainers.trajectory_store import TrajectoryStore
from ivlnce_tpu.utils import logging_util
from ivlnce_tpu.utils.prefetch import prefetch
from ivlnce_tpu.utils.registry import registry
from ivlnce_tpu.utils.tb import TensorboardWriter

logger = logging_util.logger


@registry.register_trainer(name="iterative_dagger")
class IterativeDaggerTrainer(IterativeCollectionDaggerTrainer):
    def _update_agent_iterative(
        self,
        observations,
        prev_actions,
        episode_not_done_masks,
        tour_not_done_masks,
        corrected_actions,
        weights,
        rnn_states=None,
    ):
        """iterative_dagger_trainer.py:33-94: fresh episodic slots, kept
        tour slot, detached carry."""
        import jax

        t, n = corrected_actions.shape
        reset_memory = not (
            self.config.MODEL.tour_memory
            or self.config.MODEL.tour_memory_variant
        )
        if rnn_states is None or reset_memory:
            rnn_states = self.policy.initial_rnn_states(n)
        if self.config.MODEL.tour_memory_variant:
            # reset just episodic memory slots, keep the tour slot
            rnn_states = np.asarray(rnn_states).copy()
            rnn_states[:, : self.policy.num_recurrent_layers - 1] = 0.0

        loss, action_loss, aux_loss, rnn_out = self._update_agent(
            observations,
            prev_actions,
            episode_not_done_masks,
            corrected_actions,
            weights,
            tour_not_done_masks=tour_not_done_masks,
            rnn_states=jax.lax.stop_gradient(
                rnn_states
                if not isinstance(rnn_states, np.ndarray)
                else rnn_states
            ),
        )
        return loss, action_loss, aux_loss, rnn_out

    def train(self) -> None:
        import os

        config = self.config
        if config.IL.DAGGER.preload_lmdb_features:
            store = TrajectoryStore(self.lmdb_features_dir)
            assert store.count() > 0, (
                "Cannot open database for teacher forcing preload."
            )
            store.close()
        else:
            TrajectoryStore.drop(self.lmdb_features_dir)

        config = config.clone()
        eps = config.IL.DAGGER.expert_policy_sensor
        if eps not in config.TASK_CONFIG.TASK.SENSORS:
            config.TASK_CONFIG.TASK.SENSORS.append(eps)
        if config.IL.DAGGER.p == 1.0:
            config.TASK_CONFIG.ENVIRONMENT.ITERATOR_OPTIONS.MAX_SCENE_REPEAT_STEPS = -1
        config.freeze()
        self.config = config

        from ivlnce_tpu.mapping.obs_transforms import (
            get_active_obs_transforms,
        )

        self.obs_transforms = get_active_obs_transforms(config)
        self._initialize_policy(config, config.IL.load_from_ckpt)

        os.makedirs(config.TENSORBOARD_DIR, exist_ok=True)
        with TensorboardWriter(
            config.TENSORBOARD_DIR, flush_secs=self.flush_secs
        ) as writer:
            for dagger_it in range(config.IL.DAGGER.iterations):
                step_id = 0
                if config.IL.DAGGER.preload_lmdb_features:
                    with TrajectoryStore(self.lmdb_features_dir) as store:
                        tours_to_idxs = store.get(0)["tours_to_idxs"]
                else:
                    tours_to_idxs = self._update_dataset(
                        dagger_it + (1 if config.IL.load_from_ckpt else 0),
                        save_tour_idx_data=True,
                    )

                for epoch in range(config.IL.epochs):
                    dataset = TourTrajectoryDataset(
                        self.lmdb_features_dir,
                        config.IL.use_iw,
                        inflection_weight_coef=(
                            config.IL.inflection_weight_coef
                        ),
                    )
                    sampler = TourSampler(
                        tours_to_idx=tours_to_idxs,
                        batch_size=config.IL.batch_size,
                        shuffle=True,
                        drop_last=True,
                    )
                    dataset.set_tour_done_idxs(sampler.get_tour_done_idxs())

                    rnn_states = self.policy.initial_rnn_states(
                        config.IL.batch_size
                    )
                    with prefetch(
                        dataset.batches(sampler), depth=3
                    ) as batches:
                        for batch in batches:
                            (
                                observations, prev_actions, episode_masks,
                                tour_masks, corrected, weights,
                            ) = batch
                            observations = {
                                k: v.astype(np.float32)
                                if v.dtype == np.float16
                                else v
                                for k, v in observations.items()
                            }
                            (
                                loss, action_loss, aux_loss, rnn_states,
                            ) = self._update_agent_iterative(
                                observations,
                                prev_actions,
                                episode_masks,
                                tour_masks,
                                corrected,
                                weights,
                                rnn_states=rnn_states,
                            )
                            logger.info(
                                f"train_loss: {loss:.4f} action: "
                                f"{action_loss:.4f} aux: {aux_loss:.4f} "
                                f"(dagger {dagger_it} epoch {epoch} "
                                f"batch {step_id})"
                            )
                            writer.add_scalar(
                                f"train_loss_iter_{dagger_it}", loss, step_id
                            )
                            step_id += 1
                    dataset.close()

                    self.save_checkpoint(
                        f"ckpt.{dagger_it * config.IL.epochs + epoch}.pth",
                        dagger_it=dagger_it,
                        epoch=epoch,
                        step_id=step_id,
                    )
