"""Base VLN-CE imitation-learning trainer.

Reference: ivlnce_baselines/common/base_il_trainer.py. TPU redesign:

- the policy's act / act_iterative / train-update paths are jitted pure
  functions over a params pytree; per-step host<->device traffic is one
  batched obs put and one small action get;
- the optimizer is optax adam, with the optional 100x-smaller map-encoder
  learning-rate group (base_il_trainer.py:78-92) via optax.multi_transform;
- checkpoints are pickled numpy pytrees ({params, config, optim_state,
  dagger_it, epoch, step_id}, matching the reference dict layout,
  base_il_trainer.py:143-168); reference torch .pth checkpoints load
  through models/checkpoint_io.py;
- eval loops (episodic base_il_trainer.py:313-583, iterative :585-928)
  keep the reference's control flow, masks, lane pausing, stats JSONs and
  t-nDTW aggregation.
"""

from __future__ import annotations

import contextlib
import json
import numbers
import os
import pickle
import time
from collections import defaultdict
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ivlnce_tpu.envs.vector_env import construct_envs_auto_reset_false
from ivlnce_tpu.mapping.obs_transforms import get_active_obs_transforms
from ivlnce_tpu.models import cma as cma_mod
from ivlnce_tpu.models.policy import action_logits
from ivlnce_tpu.tasks.tour_ndtw import compute_tour_ndtw
from ivlnce_tpu.utils import batching, logging_util, profiling
from ivlnce_tpu.utils.batching import (
    batch_obs,
    extract_instruction_tokens,
)
from ivlnce_tpu.utils.registry import registry
from ivlnce_tpu.utils.tb import TensorboardWriter

logger = logging_util.logger

EVAL_METRICS = (
    "distance_to_goal success spl ndtw path_length oracle_success "
    "steps_taken".split()
)


def make_train_step(policy, optimizer, use_progress: bool, alpha: float,
                    update_map_bn: bool = False):
    """Build the un-jitted BPTT train step (inflection-weighted CE +
    progress-monitor aux, base_il_trainer.py:173-219). The trainer jits it
    plain; parallel.sharded_train_step jits it over a device mesh — both
    share this exact compute graph.

    update_map_bn replicates torch train-mode BatchNorm semantics for the
    trainable map encoder (reference map_encoder.py:8-23): every training
    forward also folds momentum-updated running statistics back into the
    params so later eval-mode forwards normalize with trained stats.
    """

    def loss_fn(params, observations, prev_actions, episode_masks,
                tour_masks, corrected, weights, rnn_states):
        t, n = corrected.shape
        logits, features, rnn_out = policy.build_distribution(
            params, observations, rnn_states, prev_actions,
            episode_masks, tour_masks, training=True,
        )
        logits = logits.reshape(t, n, -1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        action_loss = -jnp.take_along_axis(
            logp, corrected[..., None], axis=-1
        )[..., 0]
        action_loss = jnp.mean(
            jnp.sum(weights * action_loss, 0) / jnp.sum(weights, 0)
        )
        aux_loss = 0.0
        if use_progress:
            p_loss = cma_mod.progress_monitor_loss(
                params, features, observations["progress"]
            )
            aux_mask = (weights > 0).reshape(-1)
            aux_loss = alpha * jnp.sum(p_loss * aux_mask) / jnp.sum(
                aux_mask
            )
        return action_loss + aux_loss, (action_loss, aux_loss, rnn_out)

    def train_step(params, opt_state, observations, prev_actions,
                   episode_masks, tour_masks, corrected, weights,
                   rnn_states):
        grads, (action_loss, aux_loss, rnn_out) = jax.grad(
            loss_fn, has_aux=True
        )(
            params, observations, prev_actions, episode_masks,
            tour_masks, corrected, weights, rnn_states,
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if update_map_bn:
            from ivlnce_tpu.models.map_encoder import map_encoder_new_stats

            params = {
                **params,
                "map_encoder": map_encoder_new_stats(
                    params["map_encoder"],
                    observations["occupancy_map"],
                    observations["semantic_map"],
                ),
            }
        return (
            params, opt_state, action_loss + aux_loss, action_loss,
            aux_loss, rnn_out,
        )

    return train_step


class BaseVLNCETrainer:
    supported_tasks: List[str] = ["VLN-v0"]

    def __init__(self, config=None):
        self.config = config
        self.policy = None
        self.params = None
        self.opt_state = None
        self.optimizer = None
        self.obs_transforms = []
        self.start_epoch = 0
        self.step_id = 0
        self.flush_secs = 30
        self._jit_cache: Dict[str, Any] = {}
        self._make_dirs()

    def _extract_tokens(self, observations):
        """extract_instruction_tokens under the task's configured uuid
        (reference base_il_trainer.py:420 — RxR tasks set
        TASK.INSTRUCTION_SENSOR_UUID=rxr_instruction, whose precomputed
        feature arrays pass through untouched)."""
        return extract_instruction_tokens(
            observations,
            self.config.TASK_CONFIG.TASK.INSTRUCTION_SENSOR_UUID,
        )

    # -- dirs ------------------------------------------------------------------
    def _make_dirs(self) -> None:
        os.makedirs(self.config.CHECKPOINT_FOLDER, exist_ok=True)
        if self.config.EVAL.SAVE_RESULTS:
            os.makedirs(self.config.RESULTS_DIR, exist_ok=True)

    # -- policy / optimizer -------------------------------------------------------
    def _observation_info(self, config) -> Dict:
        return {
            "depth_hw": config.TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT,
            "map_hw": int(
                np.ceil(
                    config.RL.POLICY.OBS_TRANSFORMS.EGOCENTRIC_MAPPER.height_meters
                    / config.RL.POLICY.OBS_TRANSFORMS.EGOCENTRIC_MAPPER.resolution_meters
                )
            ),
        }

    def _initialize_policy(self, config, load_from_ckpt: bool) -> None:
        policy_cls = registry.get_policy(self.config.MODEL.policy_name)
        self.policy = policy_cls.from_config(
            config, self._observation_info(config)
        )
        # init on the host CPU backend (leaf-by-leaf random ops are
        # pathologically slow over the axon device tunnel), then ship the
        # whole tree to the accelerator in one transfer
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            cpu = None
        if cpu is not None:
            with jax.default_device(cpu):
                params = self.policy.init_params(
                    jax.random.PRNGKey(config.TASK_CONFIG.SEED)
                )
        else:
            params = self.policy.init_params(
                jax.random.PRNGKey(config.TASK_CONFIG.SEED)
            )
        self.params = jax.device_put(params)
        self._load_external_encoders(config)

        if self.config.MODEL.SEMANTIC_MAP_ENCODER.custom_lr:
            # map-encoder parameters get their own (100x smaller) lr
            sem_lr = self.config.MODEL.SEMANTIC_MAP_ENCODER.lr

            def label_fn(params):
                return {
                    k: ("map" if k == "map_encoder" else "regular")
                    for k in params
                }

            self.optimizer = optax.multi_transform(
                {
                    "map": optax.adam(sem_lr),
                    "regular": optax.adam(self.config.IL.lr),
                },
                label_fn,
            )
        else:
            self.optimizer = optax.adam(self.config.IL.lr)
        # one fused compile: leaf-by-leaf dispatch is pathological over the
        # axon tunnel (hundreds of tiny device ops)
        self.opt_state = jax.jit(self.optimizer.init)(self.params)

        if load_from_ckpt:
            ckpt_path = config.IL.ckpt_to_load
            ckpt_dict = self.load_checkpoint(ckpt_path)
            self.params = _merge_loaded_params(self.params, ckpt_dict["params"])
            if config.IL.is_requeue and "optim_state" in ckpt_dict:
                self.opt_state = ckpt_dict["optim_state"]
                self.start_epoch = ckpt_dict["epoch"] + 1
                self.step_id = ckpt_dict["step_id"]
            logger.info(f"Loaded weights from checkpoint: {ckpt_path}")

        n_params = sum(
            x.size for x in jax.tree_util.tree_leaves(self.params)
        )
        logger.info(f"Agent parameters: {n_params}.")
        self._jit_cache = {}
        self._lane_rows = None  # fixed-lane bookkeeping resets per run
        self._txt_cache_tokens = None  # per-episode instruction cache

    def _load_external_encoders(self, config) -> None:
        """Frozen external weights: DDPPO depth, torchvision RGB, map
        encoder checkpoint (resnet_encoders.py:48-61, map_encoder.py:62-70).
        Missing files are tolerated (random init) since this environment
        has no reference data."""
        from ivlnce_tpu.models import checkpoint_io as cio

        ddppo = config.MODEL.DEPTH_ENCODER.ddppo_checkpoint
        if ddppo != "NONE" and os.path.exists(ddppo):
            enc = cio.load_ddppo_depth_encoder(ddppo)
            self.params["depth_encoder"]["visual_encoder"] = cio.merge_params(
                self.params["depth_encoder"]["visual_encoder"], enc
            )
            logger.info(f"Loaded DDPPO depth encoder: {ddppo}")
        sm = config.MODEL.SEMANTIC_MAP_ENCODER
        if sm.from_pretrained and os.path.exists(sm.checkpoint):
            self.params["map_encoder"] = cio.merge_params(
                self.params["map_encoder"], cio.load_map_encoder(sm.checkpoint)
            )
            logger.info(f"Loaded map encoder: {sm.checkpoint}")

    # -- checkpoints -----------------------------------------------------------------
    def save_checkpoint(
        self, file_name: str, dagger_it: int = 0, epoch: int = 0,
        step_id: int = 0,
    ) -> None:
        path = os.path.join(self.config.CHECKPOINT_FOLDER, file_name)
        meta = {
            "config": self.config.to_dict(),
            "dagger_it": dagger_it,
            "epoch": epoch,
            "step_id": step_id,
        }
        if self.config.TPU.async_checkpointing:
            # orbax async save: device->host copy happens now, disk IO
            # overlaps the next training steps
            import json as _json

            import orbax.checkpoint as ocp

            if getattr(self, "_orbax", None) is None:
                self._orbax = ocp.AsyncCheckpointer(
                    ocp.PyTreeCheckpointHandler()
                )
            self._orbax.save(
                os.path.abspath(path) + ".orbax",
                {"params": self.params, "optim_state": self.opt_state},
                force=True,
            )
            with open(path + ".meta.json", "w") as f:
                _json.dump(meta, f)
            return
        payload = {
            "params": jax.tree_util.tree_map(np.asarray, self.params),
            "optim_state": jax.tree_util.tree_map(
                np.asarray, self.opt_state
            ),
            **meta,
        }
        with open(path, "wb") as f:
            pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)

    def load_checkpoint(self, checkpoint_path: str) -> Dict:
        """Load our pickle / orbax checkpoints or reference torch .pth
        files."""
        if os.path.isdir(checkpoint_path + ".orbax") or os.path.isdir(
            checkpoint_path
        ):
            import json as _json

            import orbax.checkpoint as ocp

            path = checkpoint_path
            if os.path.isdir(path + ".orbax"):
                path = path + ".orbax"
            restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
            meta_path = path.replace(".orbax", "") + ".meta.json"
            meta = {}
            if os.path.exists(meta_path):
                with open(meta_path) as f:
                    meta = _json.load(f)
            return {**meta, **restored}
        with open(checkpoint_path, "rb") as f:
            head = f.read(2)
        if head == b"PK" or _is_torch_file(checkpoint_path):
            from ivlnce_tpu.models.checkpoint_io import (
                load_reference_policy_checkpoint,
            )

            return load_reference_policy_checkpoint(checkpoint_path)
        with open(checkpoint_path, "rb") as f:
            return pickle.load(f)

    # -- jit caches -------------------------------------------------------------------
    def _eval_sample(self) -> bool:
        """EVAL.SAMPLE: sample actions instead of argmax during eval
        (base_il_trainer.py:452,699)."""
        return bool(self.config.EVAL.SAMPLE)

    def _step_key_data(self) -> np.ndarray:
        """Raw uint32[2] PRNG key material for one sampling step, derived
        host-side (seed, step counter) — no eager device RNG ops, which are
        pathologically slow over the TPU tunnel."""
        return np.array(
            [self.config.TASK_CONFIG.SEED, self._step_counter], np.uint32
        )

    def _act_fn(self, iterative: bool):
        key = f"act_{iterative}"
        if key not in self._jit_cache:
            policy = self.policy
            sample = self._eval_sample()
            if iterative:
                def fn(params, obs, rnn, prev, am, sm, tm, act_m, key_data):
                    obs = batching.decode_wire_obs(obs)
                    rng = jax.random.wrap_key_data(key_data) if sample else None
                    return policy.act_iterative(
                        params, obs, rnn, prev, am, sm, tm, act_m,
                        rng_key=rng, deterministic=not sample,
                    )
            else:
                def fn(params, obs, rnn, prev, masks, key_data):
                    obs = batching.decode_wire_obs(obs)
                    rng = jax.random.wrap_key_data(key_data) if sample else None
                    return policy.act(
                        params, obs, rnn, prev, masks, rng_key=rng,
                        deterministic=not sample,
                    )
            donate = (2,) if self.config.TPU.donate_state else ()
            self._jit_cache[key] = jax.jit(fn, donate_argnums=donate)
        return self._jit_cache[key]

    def _fused_act_fn(self, transform, iterative: bool):
        """One jit per env step: mapper device step + policy act fused.
        Separate executables pay a ~10x fresh-input dispatch penalty on
        the TPU tunnel (an executable consuming another's outputs), and
        one fused executable is the TPU-right design regardless."""
        key = f"fused_act_{iterative}_{type(transform).__name__}"
        if key not in self._jit_cache:
            device_step = transform.make_device_step()
            policy = self.policy
            sample = self._eval_sample()

            if iterative:
                def fn(params, rednet_params, state, obs, reset_masks,
                       rnn, prev, am, sm, tm, act_m, key_data):
                    obs = batching.decode_wire_obs(obs)
                    rng = jax.random.wrap_key_data(key_data) if sample else None
                    state, occ, sem = device_step(
                        state, obs, reset_masks, rednet_params
                    )
                    pobs = dict(obs)
                    pobs["occupancy_map"] = occ
                    pobs["semantic_map"] = sem
                    out = policy.act_iterative(
                        params, pobs, rnn, prev, am, sm, tm, act_m,
                        rng_key=rng, deterministic=not sample,
                    )
                    return state, occ, sem, out
            else:
                def fn(params, rednet_params, state, obs, reset_masks,
                       rnn, prev, masks, key_data):
                    obs = batching.decode_wire_obs(obs)
                    rng = jax.random.wrap_key_data(key_data) if sample else None
                    state, occ, sem = device_step(
                        state, obs, reset_masks, rednet_params
                    )
                    pobs = dict(obs)
                    pobs["occupancy_map"] = occ
                    pobs["semantic_map"] = sem
                    out = policy.act(
                        params, pobs, rnn, prev, masks, rng_key=rng,
                        deterministic=not sample,
                    )
                    return state, occ, sem, out

            # donate the mapper world-grid state (arg 2) and the RNN carry
            # (arg 5) so XLA reuses their HBM in place; TPU.donate_state
            # defaults off because the axon tunnel backend rejects donation
            donate = (2, 5) if self.config.TPU.donate_state else ()
            self._jit_cache[key] = jax.jit(fn, donate_argnums=donate)
        return self._jit_cache[key]

    # -- fixed-lane bookkeeping ----------------------------------------------------
    # Device-side step state (RNN hidden, mapper world grid) keeps its
    # ORIGINAL lane count for a whole eval run; when an env pauses, only
    # the host-side lane map shrinks. The jit therefore compiles ONCE —
    # the reference instead reshapes the batch on every pause (and a jit
    # would recompile per batch size, ~30 s each through the TPU tunnel).
    def _reset_lanes(self, num_lanes: int) -> None:
        self._lane_rows = np.arange(num_lanes)
        self._num_rows = num_lanes

    def _pause_lane(self, index: int) -> None:
        if getattr(self, "_lane_rows", None) is not None:
            self._lane_rows = np.delete(self._lane_rows, index)

    def _expand_rows(self, arr, fill=0):
        """Scatter a live-lane host array into full-width rows."""
        arr = np.asarray(arr)
        rows = self._lane_rows
        if len(rows) == self._num_rows:
            return arr
        full = np.full((self._num_rows,) + arr.shape[1:], fill, arr.dtype)
        full[rows] = arr
        return full

    def _wire_device_obs(self, batch, transform) -> Dict[str, Any]:
        """Build the device-side obs for one act dispatch: expand live
        lanes to full-width rows, upload ONLY keys the fused executable
        reads (utils/batching.wire_obs_keys — the loops are
        upload-bandwidth-bound on constrained transports), ship depth as
        uint16 when enabled, and consume instruction tokens into the
        per-episode feature cache. Shared by the eval _policy_step and
        the DAgger _collect_step so the two upload paths cannot drift."""
        wire_keys = batching.wire_obs_keys(self.policy, transform)
        dobs = {
            k: self._expand_rows(v)
            for k, v in _device_batch(batch).items()
            if (
                transform is None
                or k not in ("occupancy_map", "semantic_map")
            )
            and (wire_keys is None or k in wire_keys)
        }
        dobs = batching.encode_wire_obs(
            dobs, self.config.TPU.wire_depth_uint16
        )
        return self._cache_instruction_features(dobs)

    def _policy_step(self, batch, reset_masks, rnn_states, prev_actions,
                     masks, iterative: bool, need_maps: bool = True,
                     defer_maps: bool = False):
        """Run one policy step, fusing the active mapper obs transform
        into the act executable. ``masks`` is the tuple of act masks
        ((not_done,) episodic; (agent, sim, tour, action) iterative).
        Returns (PolicyOutput, batch) — batch gains occupancy_map /
        semantic_map when a mapper is active AND ``need_maps``. Inputs are
        live-lane host arrays; rnn_states is the full-width device carry
        returned by the previous call.

        Host<->device traffic discipline (the eval loop's cost is round
        trips through the device transport, ~30 ms each on the tunnel,
        not compute): ONE device_get fetches actions (+ maps only when
        ``need_maps`` — they exist solely for video frames and trajectory
        stores); logits stay a device array (consumers np.asarray on
        demand); the mapper's occupancy/semantic outputs are never
        re-uploaded as observations (the fused executable recomputes them
        from carried state)."""
        # on-demand trace capture of steps [3, 23) (TPU.profile_dir)
        self._step_counter = getattr(self, "_step_counter", 0) + 1
        if self._step_counter == 3:
            profiling.maybe_start_trace(self.config)
        elif self._step_counter == 23:
            profiling.maybe_stop_trace()

        if getattr(self, "_lane_rows", None) is None or (
            rnn_states.shape[0] != self._num_rows
        ):
            self._reset_lanes(rnn_states.shape[0])
        rows = self._lane_rows

        transform = self.obs_transforms[0] if self.obs_transforms else None
        if transform is not None:
            # BEFORE the wire obs: host_prepare may synthesize wire keys
            # (scene_center) besides allocating state / preloading maps
            transform.host_prepare(
                batch,
                np.asarray(reset_masks).reshape(-1),
                rows=rows,
                num_rows=self._num_rows,
            )
        dobs = self._wire_device_obs(batch, transform)
        # pad masks with 0: dead rows stay reset and their prev-action
        # embedding indexes the masked slot
        masks_full = tuple(self._expand_rows(m) for m in masks)
        prev_full = self._expand_rows(prev_actions)

        key_data = self._step_key_data()
        if transform is None:
            act = self._act_fn(iterative)
            with profiling.range_context("policy_step"):
                out = act(
                    self.params, dobs, rnn_states, prev_full, *masks_full,
                    key_data,
                )
        else:
            fused = self._fused_act_fn(transform, iterative)
            reset_full = self._expand_rows(
                np.asarray(reset_masks, np.float32).reshape(-1, 1)
            )
            with profiling.range_context("fused_policy_step"):
                state, occ, sem, out = fused(
                    self.params,
                    transform.rednet_params or {},
                    transform.state,
                    dobs,
                    jnp.asarray(reset_full.reshape(-1)),
                    rnn_states,
                    prev_full,
                    *masks_full,
                    key_data,
                )
            transform.state = state

        # one readback round trip for everything the host needs this step;
        # with defer_maps the map fetch waits for _materialize_maps, which
        # eval loops call AFTER envs.step_async so it overlaps simulation
        self._pending_maps = None
        fetch = [out.actions]
        if transform is not None and need_maps:
            if defer_maps:
                self._pending_maps = (occ, sem, rows)
            else:
                fetch += [occ, sem]
        got = jax.device_get(tuple(fetch))
        if len(got) == 3:
            batch["occupancy_map"] = got[1][rows]
            batch["semantic_map"] = got[2][rows]

        from ivlnce_tpu.models.policy import PolicyOutput

        out = PolicyOutput(
            actions=np.array(got[0])[rows],
            rnn_states=out.rnn_states,  # full-width device carry
            logits=out.logits,  # full-width DEVICE array (lazy fetch)
        )
        return out, batch

    def _cache_instruction_features(self, dobs):
        """Encode the instruction bi-LSTM once per EPISODE, not per step.

        The instruction is constant within an episode, yet the reference
        re-runs its packed bi-LSTM every forward
        (map_cma_policy.py:293/instruction_encoder.py:63-94) — at 80
        tokens x 2 directions that is the single largest op count in the
        step executable. Here the tokens (or RxR features) are compared
        host-side against the previous step's; on change (episode
        boundary) a small standalone executable re-encodes, and the hot
        fused step consumes the cached per-token features — it contains
        no token scan at all."""
        key = (
            "instruction" if "instruction" in dobs else
            "rxr_instruction" if "rxr_instruction" in dobs else None
        )
        if key is None:
            return dobs
        tokens = np.asarray(dobs[key])
        cached = getattr(self, "_txt_cache_tokens", None)
        if cached is None or not np.array_equal(tokens, cached):
            if "txt_encode" not in self._jit_cache:
                # the policy's model config (NOT self.config.MODEL): the
                # CMA nets force final_state_only=False on construction
                cfg = self.policy.model_config.INSTRUCTION_ENCODER

                def encode(params, obs):
                    from ivlnce_tpu.models import instruction_encoder as IE

                    return IE.apply_instruction_encoder(
                        params["instruction_encoder"], cfg, obs
                    )

                self._jit_cache["txt_encode"] = jax.jit(encode)
            self._txt_cache = self._jit_cache["txt_encode"](
                self.params, {key: dobs[key]}
            )
            self._txt_cache_tokens = tokens.copy()
        dobs = dict(dobs)
        del dobs[key]
        dobs["instruction_features"] = self._txt_cache
        return dobs

    def _materialize_maps(self, batch) -> None:
        """Fetch the deferred occupancy/semantic maps into ``batch``
        (issued by _policy_step(defer_maps=True); called after
        envs.step_async so the readback overlaps simulation)."""
        if getattr(self, "_pending_maps", None) is None:
            return
        occ, sem, rows = self._pending_maps
        self._pending_maps = None
        occ_np, sem_np = jax.device_get((occ, sem))
        batch["occupancy_map"] = occ_np[rows]
        batch["semantic_map"] = sem_np[rows]

    def _data_parallel_devices(self, n_lanes: int) -> int:
        """Data-axis size for the IL update: TPU.data_parallel_devices
        (1 = off, N = use up to N devices, -1 = all available), capped by
        the devices present and by divisibility — the batch must shard
        evenly, so the LARGEST device count <= the cap that divides the
        lane count is used (the default IL.batch_size=5 on an 8-device
        host still engages 5-way data parallelism rather than silently
        running single-device)."""
        want = self.config.TPU.data_parallel_devices
        if want in (0, 1):
            return 1
        avail = jax.device_count()
        n = avail if want < 0 else min(want, avail)
        full = n
        while n > 1 and n_lanes % n != 0:
            n -= 1
        if n < full:
            # evaluated per update: warn once per distinct lane count
            warned = getattr(self, "_dp_warned_lanes", set())
            if n_lanes not in warned:
                warned.add(n_lanes)
                self._dp_warned_lanes = warned
                logger.warning(
                    f"data-parallel IL update using {n}/{full} devices: "
                    f"batch lanes ({n_lanes}) not divisible by {full}"
                )
        return n

    def _train_step_fn(self, n_lanes: int):
        # the DP decision depends on the batch's lane count (divisibility)
        # — key the cache by the resolved device count so a divisible
        # batch after an odd one (or vice versa) gets the right step
        # instead of a cached mismatched sharding
        ndp = self._data_parallel_devices(n_lanes)
        key = f"train_step_dp{ndp}"
        if key not in self._jit_cache:
            update_map_bn = (
                self.config.MODEL.policy_name == "MapCMAPolicy"
                and self.config.MODEL.SEMANTIC_MAP_ENCODER.trainable
            )
            if ndp > 1:
                from ivlnce_tpu.parallel import make_mesh
                from ivlnce_tpu.parallel.train import sharded_train_step

                mesh = make_mesh(ndp)
                logger.info(
                    f"IL update: data-parallel over {ndp} devices "
                    f"(mesh {dict(mesh.shape)})"
                )
                self._jit_cache[key] = sharded_train_step(
                    self.policy,
                    self.optimizer,
                    mesh,
                    self.params,
                    self.opt_state,
                    use_progress=self.config.MODEL.PROGRESS_MONITOR.use,
                    alpha=self.config.MODEL.PROGRESS_MONITOR.alpha,
                    update_map_bn=update_map_bn,
                )
            else:
                self._jit_cache[key] = jax.jit(
                    make_train_step(
                        self.policy,
                        self.optimizer,
                        self.config.MODEL.PROGRESS_MONITOR.use,
                        self.config.MODEL.PROGRESS_MONITOR.alpha,
                        update_map_bn=update_map_bn,
                    )
                )
        return self._jit_cache[key]

    def _update_agent(
        self,
        observations: Dict[str, np.ndarray],
        prev_actions: np.ndarray,
        not_done_masks: np.ndarray,
        corrected_actions: np.ndarray,
        weights: np.ndarray,
        tour_not_done_masks: Optional[np.ndarray] = None,
        rnn_states=None,
    ) -> Tuple[float, float, float, Any]:
        """One BPTT update over a (T, N) batch (base_il_trainer.py:173-219).
        rnn_states carry enables tour-ordered truncated BPTT
        (iterative_dagger_trainer.py:33-94)."""
        t, n = corrected_actions.shape
        if rnn_states is None:
            rnn_states = self.policy.initial_rnn_states(n)
        if tour_not_done_masks is None:
            tour_not_done_masks = not_done_masks

        def canon_masks(m):
            # the dagger collate ships masks T-major flattened (T*N, 1);
            # the mesh-sharded step's specs expect (T, N) — one layout
            # for both paths (row-major reshape inverts the flatten
            # exactly; build_distribution accepts either)
            m = np.asarray(m)
            if n > 1 and m.shape == (t * n, 1):
                return m.reshape(t, n)
            return m

        not_done_masks = canon_masks(not_done_masks)
        tour_not_done_masks = canon_masks(tour_not_done_masks)
        step = self._train_step_fn(n)
        with profiling.range_context("train_step"):
            (
                self.params, self.opt_state, loss, action_loss, aux_loss,
                rnn_out,
            ) = step(
                self.params,
                self.opt_state,
                observations,
                jnp.asarray(prev_actions),
                jnp.asarray(not_done_masks, jnp.float32),
                jnp.asarray(tour_not_done_masks, jnp.float32),
                jnp.asarray(corrected_actions, jnp.int32),
                jnp.asarray(weights, jnp.float32),
                rnn_states,
            )
        # params changed: cached per-episode instruction features are stale
        self._txt_cache_tokens = None
        return float(loss), float(action_loss), float(aux_loss), rnn_out

    # -- lane pausing -----------------------------------------------------------------
    def _pause_envs(self, envs_to_pause, envs, *arrays, batch=None,
                    rgb_frames=None):
        if len(envs_to_pause) > 0:
            lane_mode = getattr(self, "_lane_rows", None) is not None
            state_index = list(range(envs.num_envs))
            for idx in reversed(envs_to_pause):
                state_index.pop(idx)
                envs.pause_at(idx)
                if lane_mode:
                    self._pause_lane(idx)
            keep = np.asarray(state_index, dtype=np.int64)
            arrays = tuple(np.asarray(a)[keep] for a in arrays)
            if batch is not None:
                for k, v in batch.items():
                    if isinstance(v, list):
                        batch[k] = [v[i] for i in state_index]
                    else:
                        batch[k] = np.asarray(v)[keep]
            if rgb_frames is not None:
                rgb_frames = [rgb_frames[i] for i in state_index]
            if not lane_mode:
                # legacy path: compact mapper state with the batch
                # (base_il_trainer.py:296-299)
                for transform in self.obs_transforms:
                    for idx in reversed(envs_to_pause):
                        transform.delete_batch_idx(idx)
        return (envs,) + arrays + (batch, rgb_frames)

    # -- eval entry point (habitat BaseTrainer semantics) ------------------------------
    def eval(self) -> None:
        os.makedirs(self.config.TENSORBOARD_DIR, exist_ok=True)
        with TensorboardWriter(
            self.config.TENSORBOARD_DIR, flush_secs=self.flush_secs
        ) as writer:
            ckpt_dir = self.config.EVAL_CKPT_PATH_DIR
            if os.path.isfile(ckpt_dir):
                ckpt_index = 0
                with contextlib.suppress(Exception):
                    ckpt_index = int(ckpt_dir.split(".")[-2])
                self._eval_checkpoint(ckpt_dir, writer, ckpt_index)
            else:
                ckpts = sorted(
                    (
                        f
                        for f in os.listdir(ckpt_dir)
                        if f.startswith("ckpt.")
                    ),
                    key=lambda f: int(f.split(".")[1]),
                )
                for f in ckpts:
                    idx = int(f.split(".")[1])
                    self._eval_checkpoint(
                        os.path.join(ckpt_dir, f), writer, idx
                    )

    def inference(self) -> None:
        raise NotImplementedError

    def _setup_eval_config(self, checkpoint_config):
        """Merge a checkpoint's saved config under the eval config
        (habitat-lab BaseRLTrainer._setup_eval_config semantics; overwrite
        priority: eval_opts > ckpt_opts > eval_cfg > ckpt_cfg)."""
        from ivlnce_tpu.config.node import ConfigNode as CN

        if isinstance(checkpoint_config, dict):
            checkpoint_config = CN(checkpoint_config)
        config = self.config.clone()
        ckpt_cmd_opts = list(checkpoint_config.CMD_TRAILING_OPTS) if (
            "CMD_TRAILING_OPTS" in checkpoint_config
        ) else []
        eval_cmd_opts = list(config.CMD_TRAILING_OPTS)
        try:
            config.merge_from_other_cfg(checkpoint_config)
            config.merge_from_other_cfg(self.config)
            config.merge_from_list(ckpt_cmd_opts)
            config.merge_from_list(eval_cmd_opts)
        except KeyError:
            logger.info("Saved config is outdated, using solely eval config")
            config = self.config.clone()
            config.merge_from_list(eval_cmd_opts)
        if config.TASK_CONFIG.DATASET.SPLIT == "train":
            config.TASK_CONFIG.DATASET.SPLIT = "val"
        config.TASK_CONFIG.SIMULATOR.AGENT_0.SENSORS = list(
            self.config.SENSORS
        )
        return config

    # -- episodic eval (base_il_trainer.py:313-583) --------------------------------------
    def _eval_checkpoint(
        self,
        checkpoint_path: str,
        writer,
        checkpoint_index: int = 0,
        metrics: Optional[List[str]] = None,
    ) -> None:
        if metrics is None:
            metrics = list(EVAL_METRICS)
        # per-checkpoint phase attribution (accumulators are process-wide)
        profiling.reset_phases()

        with contextlib.suppress(Exception):
            checkpoint_index = int(checkpoint_path.split(".")[-2])

        start_from = self.config.EVAL.START_FROM
        if 0 <= start_from > checkpoint_index:
            logger.info(f"skipping ckpt: starting from {start_from}.")
            return

        logger.info(f"checkpoint_path: {checkpoint_path}")
        if self.config.EVAL.USE_CKPT_CONFIG:
            config = self._setup_eval_config(
                self.load_checkpoint(checkpoint_path).get("config", {})
            )
        else:
            config = self.config.clone()
        config.TASK_CONFIG.DATASET.SPLIT = config.EVAL.SPLIT
        config.TASK_CONFIG.DATASET.ROLES = ["guide"]
        config.TASK_CONFIG.DATASET.LANGUAGES = config.EVAL.LANGUAGES
        config.TASK_CONFIG.TASK.NDTW.SPLIT = config.EVAL.SPLIT
        config.TASK_CONFIG.ENVIRONMENT.ITERATOR_OPTIONS.SHUFFLE = False
        config.TASK_CONFIG.ENVIRONMENT.ITERATOR_OPTIONS.MAX_SCENE_REPEAT_STEPS = -1
        config.TASK_CONFIG.ENVIRONMENT.ITERATOR_OPTIONS.SHUFFLE_TOURS = False
        config.TASK_CONFIG.ENVIRONMENT.ITERATOR_OPTIONS.SHUFFLE_EPISODES = False
        config.IL.ckpt_to_load = checkpoint_path
        if len(config.VIDEO_OPTION) > 0:
            # drawn map measure only when videos requested
            # (base_il_trainer.py:352-373)
            os.makedirs(config.VIDEO_DIR, exist_ok=True)
            if (
                "TOP_DOWN_MAP_VLNCE"
                not in config.TASK_CONFIG.TASK.MEASUREMENTS
            ):
                config.TASK_CONFIG.TASK.MEASUREMENTS.append(
                    "TOP_DOWN_MAP_VLNCE"
                )
        config.freeze()

        if config.TASK_CONFIG.ENVIRONMENT.ITERATIVE.ENABLED:
            self._eval_checkpoint_iterative(
                config, writer=writer, checkpoint_index=checkpoint_index
            )
            return

        split = config.TASK_CONFIG.DATASET.SPLIT
        if config.EVAL.SAVE_RESULTS:
            fname = os.path.join(
                config.RESULTS_DIR,
                f"stats_ckpt_{checkpoint_index}_{split}.json",
            )
            if os.path.exists(fname):
                logger.info("skipping -- evaluation exists.")
                return

        env_class = registry.get_env(config.ENV_NAME)
        envs = construct_envs_auto_reset_false(config, env_class)
        self.obs_transforms = get_active_obs_transforms(config)
        self._initialize_policy(config, load_from_ckpt=True)

        rnn_states = self.policy.initial_rnn_states(envs.num_envs)
        prev_actions = np.zeros((envs.num_envs, 1), np.int64)
        not_done_masks = np.zeros((envs.num_envs, 1), np.uint8)

        observations = envs.reset()
        observations = self._extract_tokens(observations)
        batch = batch_obs(observations)

        stats_episodes: Dict[str, Dict] = {}
        episodes_to_eval = sum(envs.count_episodes())
        if config.EVAL.EPISODE_COUNT > -1:
            episodes_to_eval = min(
                config.EVAL.EPISODE_COUNT, episodes_to_eval
            )
        rgb_frames: List[List] = [[] for _ in range(envs.num_envs)]

        start_time = time.time()
        env_steps = 0
        while envs.num_envs > 0 and len(stats_episodes) < episodes_to_eval:
            env_steps += envs.num_envs
            current_episodes = self._current_episode_info(envs)

            with profiling.wall_range("policy_step"):
                out, batch = self._policy_step(
                    batch, not_done_masks, rnn_states, prev_actions,
                    (not_done_masks,), iterative=False,
                    need_maps=len(config.VIDEO_OPTION) > 0, defer_maps=True,
                )
            rnn_states = out.rnn_states
            actions = np.array(out.actions)  # copy: reset writes in place
            prev_actions = actions

            # sims run while the deferred map readback happens on the host
            envs.step_async([int(a[0]) for a in actions])
            with profiling.wall_range("materialize_maps"):
                self._materialize_maps(batch)
            with profiling.wall_range("env_step_wait"):
                outputs = envs.step_wait()
            observations, _, dones, infos = (list(x) for x in zip(*outputs))

            not_done_masks = np.array(
                [[0] if done else [1] for done in dones], np.uint8
            )
            for i in range(envs.num_envs):
                if len(config.VIDEO_OPTION) > 0:
                    from ivlnce_tpu.utils import viz

                    frame = viz.observations_to_image(
                        observations[i], infos[i]
                    )
                    frame = viz.append_text_to_image(
                        frame, current_episodes[i].get("instruction_text", "")
                    )
                    if "occupancy_map" in batch:
                        map_frame = viz.append_image_horizontally(
                            [
                                viz.visualize_ego_occupancy_map(
                                    np.asarray(batch["occupancy_map"][i])
                                ),
                                viz.visualize_ego_semantic_map(
                                    np.asarray(batch["semantic_map"][i])
                                ),
                            ]
                        )
                        frame = viz.append_image_vertically(
                            [frame, map_frame]
                        )
                    rgb_frames[i].append(frame)

                if not dones[i]:
                    continue
                stats_episodes[current_episodes[i]["episode_id"]] = {
                    k: infos[i][k] for k in metrics if k in infos[i]
                }
                observations[i] = envs.reset_at(i)
                prev_actions[i] = 0
                elapsed = time.time() - start_time
                logger.info(
                    f"[Ckpt: {checkpoint_index}] episodes evaluated: "
                    f"{len(stats_episodes)}/{episodes_to_eval} "
                    f"({round(elapsed)}s, "
                    f"{env_steps / max(elapsed, 1e-6):.1f} env steps/s)"
                )
                report = profiling.phase_report()
                if report:
                    logger.info(f"phase times: {report}")
                if len(config.VIDEO_OPTION) > 0:
                    from ivlnce_tpu.utils import viz

                    viz.generate_video(
                        video_option=config.VIDEO_OPTION,
                        video_dir=config.VIDEO_DIR,
                        images=rgb_frames[i],
                        episode_id=current_episodes[i]["episode_id"],
                        checkpoint_idx=checkpoint_index,
                        metrics={
                            "spl": stats_episodes[
                                current_episodes[i]["episode_id"]
                            ].get("spl", 0.0)
                        },
                        tb_writer=writer,
                    )
                    rgb_frames[i] = []

            with profiling.wall_range("batch_obs"):
                observations = self._extract_tokens(observations)
                batch = batch_obs(observations)

            next_episodes = self._current_episode_info(envs)
            envs_to_pause = [
                i
                for i in range(envs.num_envs)
                if next_episodes[i]["episode_id"] in stats_episodes
            ]
            # rnn_states stays full-width on device (fixed-lane mode)
            (
                envs, not_done_masks, prev_actions, batch, rgb_frames,
            ) = self._pause_envs(
                envs_to_pause, envs, not_done_masks,
                prev_actions, batch=batch, rgb_frames=rgb_frames,
            )

        envs.close()
        for transform in self.obs_transforms:
            if hasattr(transform, "warn_if_dropped"):
                transform.warn_if_dropped("episodic eval")

        aggregated_stats = {}
        num_episodes = max(len(stats_episodes), 1)
        if stats_episodes:
            for stat_key in next(iter(stats_episodes.values())).keys():
                aggregated_stats[stat_key] = (
                    sum(v[stat_key] for v in stats_episodes.values())
                    / num_episodes
                )

        if config.EVAL.SAVE_RESULTS:
            fname = os.path.join(
                config.RESULTS_DIR,
                f"stats_ckpt_{checkpoint_index}_{split}.json",
            )
            with open(fname, "w") as f:
                json.dump(aggregated_stats, f, indent=4)

        logger.info(f"Episodes evaluated: {num_episodes}")
        for k, v in aggregated_stats.items():
            logger.info(f"Average episode {k}: {v:.6f}")
            writer.add_scalar(f"eval_{split}_{k}", v, checkpoint_index + 1)
        return aggregated_stats

    # -- iterative eval (base_il_trainer.py:585-928) --------------------------------------
    def _eval_checkpoint_iterative(
        self, config, writer, checkpoint_index: int = 0
    ):
        # per-checkpoint phase attribution (accumulators are process-wide)
        profiling.reset_phases()
        if "Iterative" not in config.ENV_NAME:
            config = config.clone()
            config.ENV_NAME = config.TASK_CONFIG.ENVIRONMENT.ITERATIVE.ENV_NAME
            config.freeze()

        split = config.TASK_CONFIG.DATASET.SPLIT
        if config.EVAL.SAVE_RESULTS:
            fname = os.path.join(
                config.RESULTS_DIR,
                f"iterative_stats_ckpt_{checkpoint_index}_{split}.json",
            )
            if os.path.exists(fname):
                logger.info("skipping -- evaluation exists.")
                return

        # reference reads the trainer's own config here, not the eval clone
        map_reset = self.config.EVAL.ITERATIVE_MAP_RESET
        assert map_reset in ["episodic", "iterative"], (
            "config.EVAL.ITERATIVE_MAP_RESET not valid"
        )

        env_class = registry.get_env(config.ENV_NAME)
        envs = construct_envs_auto_reset_false(config, env_class)
        self.obs_transforms = get_active_obs_transforms(config)
        self._initialize_policy(config, load_from_ckpt=True)

        rnn_states = self.policy.initial_rnn_states(envs.num_envs)
        prev_actions = np.zeros((envs.num_envs, 1), np.int64)
        agent_masks = np.zeros((envs.num_envs, 1), np.uint8)
        sim_masks = np.zeros((envs.num_envs, 1), np.uint8)
        tour_masks = np.zeros((envs.num_envs, 1), np.uint8)
        action_masks = np.ones((envs.num_envs, 1), np.uint8)

        observations, _, _ = (list(x) for x in zip(*envs.reset()))
        observations = self._extract_tokens(observations)
        batch = batch_obs(observations)

        stats_tours: Dict[str, Dict] = defaultdict(dict)
        dtw_data: Dict[str, List] = defaultdict(list)
        rgb_frames: List[List] = [[] for _ in range(envs.num_envs)]
        episodes_evaluated = 0
        episodes_to_eval = sum(envs.count_episodes())
        if config.EVAL.EPISODE_COUNT > -1:
            episodes_to_eval = min(
                config.EVAL.EPISODE_COUNT, episodes_to_eval
            )
        start_time = time.time()

        env_steps = 0
        while envs.num_envs > 0:
            env_steps += envs.num_envs
            current_episodes = self._current_episode_info(envs)
            reset_masks = (
                agent_masks if map_reset == "episodic" else tour_masks
            )
            with profiling.wall_range("policy_step"):
                out, batch = self._policy_step(
                    batch, reset_masks, rnn_states, prev_actions,
                    (agent_masks, sim_masks, tour_masks, action_masks),
                    iterative=True,
                    need_maps=len(config.VIDEO_OPTION) > 0, defer_maps=True,
                )
            rnn_states = out.rnn_states
            # np.array (copy): device arrays view as read-only numpy and
            # the reset path below writes prev_actions[i] = 0 in place
            with profiling.wall_range("action_readback"):
                actions = np.array(out.actions)
            prev_actions = actions

            envs.step_async([int(a[0]) for a in actions])
            with profiling.wall_range("materialize_maps"):
                self._materialize_maps(batch)
            with profiling.wall_range("env_step_wait"):
                outputs = envs.step_wait()
            (
                observations, _, agent_dones, sim_dones, tour_dones,
                produce_actions, infos,
            ) = (list(x) for x in zip(*outputs))

            agent_masks = np.array(
                [[0] if d else [1] for d in agent_dones], np.uint8
            )
            sim_masks = np.array(
                [[0] if d else [1] for d in sim_dones], np.uint8
            )
            tour_masks = np.array(
                [[0] if d else [1] for d in tour_dones], np.uint8
            )
            action_masks = np.array(
                [[int(p)] for p in produce_actions], np.uint8
            )

            for i in range(envs.num_envs):
                if len(config.VIDEO_OPTION) > 0:
                    from ivlnce_tpu.utils import viz

                    frame = viz.observations_to_image(
                        observations[i], infos[i]
                    )
                    frame = viz.append_text_to_image(
                        frame, current_episodes[i].get("instruction_text", "")
                    )
                    if "occupancy_map" in batch:
                        map_frame = viz.append_image_horizontally(
                            [
                                viz.visualize_ego_occupancy_map(
                                    np.asarray(batch["occupancy_map"][i])
                                ),
                                viz.visualize_ego_semantic_map(
                                    np.asarray(batch["semantic_map"][i])
                                ),
                            ]
                        )
                        frame = viz.append_image_vertically(
                            [frame, map_frame]
                        )
                    rgb_frames[i].append(frame)

                if not agent_dones[i]:
                    continue
                ep_id = current_episodes[i]["episode_id"]
                tour_id = current_episodes[i]["tour_id"]
                if ep_id not in stats_tours[tour_id] and len(infos[i]) > 1:
                    episodes_evaluated += 1
                    stats_tours[tour_id][ep_id] = {
                        k: v
                        for k, v in infos[i].items()
                        if isinstance(v, numbers.Number)
                    }
                    elapsed = time.time() - start_time
                    logger.info(
                        f"[Ckpt: {checkpoint_index}] episodes evaluated: "
                        f"{episodes_evaluated}/{episodes_to_eval} "
                        f"({round(elapsed)}s, "
                        f"{env_steps / max(elapsed, 1e-6):.1f} env steps/s)"
                    )
                    report = profiling.phase_report()
                    if report:
                        logger.info(f"phase times: {report}")

                if not sim_dones[i]:
                    continue
                if "dtw_data" in infos[i]:
                    dtw_data[tour_id].extend(infos[i]["dtw_data"])
                if len(config.VIDEO_OPTION) > 0 and rgb_frames[i]:
                    from ivlnce_tpu.utils import viz

                    viz.generate_video(
                        video_option=config.VIDEO_OPTION,
                        video_dir=config.VIDEO_DIR,
                        images=rgb_frames[i],
                        episode_id=ep_id,
                        checkpoint_idx=checkpoint_index,
                        metrics={
                            "spl": stats_tours[tour_id]
                            .get(ep_id, {})
                            .get("spl", 0.0)
                        },
                        tb_writer=writer,
                    )
                    rgb_frames[i] = []

                observations[i], tour_done, produce_action = envs.reset_at(i)
                tour_masks[i] = int(not tour_done)
                action_masks[i] = int(produce_action)
                prev_actions[i] = 0

            with profiling.wall_range("batch_obs"):
                observations = self._extract_tokens(observations)
                batch = batch_obs(observations)

            next_episodes = self._current_episode_info(envs)
            envs_to_pause = []
            for i in range(envs.num_envs):
                if not sim_dones[i]:
                    continue
                tour_id = next_episodes[i]["tour_id"]
                if next_episodes[i]["episode_id"] in stats_tours[tour_id]:
                    envs_to_pause.append(i)
            # rnn_states stays full-width on device (fixed-lane mode)
            (
                envs, agent_masks, sim_masks, tour_masks,
                action_masks, prev_actions, batch, rgb_frames,
            ) = self._pause_envs(
                envs_to_pause, envs, agent_masks, sim_masks,
                tour_masks, action_masks, prev_actions, batch=batch,
                rgb_frames=rgb_frames,
            )

        envs.close()
        for transform in self.obs_transforms:
            if hasattr(transform, "warn_if_dropped"):
                transform.warn_if_dropped("iterative eval")

        fname = os.path.join(
            config.RESULTS_DIR, f"dtw_data_ckpt_{checkpoint_index}_{split}.json"
        )
        with open(fname, "w") as f:
            json.dump(dtw_data, f, indent=2)
        fname = os.path.join(
            config.RESULTS_DIR,
            f"iterative_all_stats_ckpt_{checkpoint_index}_{split}.json",
        )
        with open(fname, "w") as f:
            json.dump(stats_tours, f, indent=2)

        aggregated_stats: Dict[str, float] = defaultdict(float)
        for stats_episodes in stats_tours.values():
            for stat_key in next(iter(stats_episodes.values())).keys():
                aggregated_stats[stat_key] += sum(
                    v.get(stat_key, 0.0) for v in stats_episodes.values()
                )
        episodes_evaluated = sum(len(v) for v in stats_tours.values())
        for stat_key in aggregated_stats:
            aggregated_stats[stat_key] /= max(episodes_evaluated, 1)

        if os.path.exists(config.EVAL.ITERATIVE_GT_PATHS):
            with open(config.EVAL.ITERATIVE_GT_PATHS, "r") as f:
                gt_paths = json.load(f)
            aggregated_stats["tndtw"] = compute_tour_ndtw(
                agent_paths=dtw_data,
                gt_paths=gt_paths[split],
                success_distance=config.TASK_CONFIG.TASK.NDTW.SUCCESS_DISTANCE,
            )
        else:
            logger.warning(
                "no iterative GT paths file at "
                f"{config.EVAL.ITERATIVE_GT_PATHS}; skipping t-nDTW"
            )

        if config.EVAL.SAVE_RESULTS:
            fname = os.path.join(
                config.RESULTS_DIR,
                f"iterative_stats_ckpt_{checkpoint_index}_{split}.json",
            )
            with open(fname, "w") as f:
                json.dump(aggregated_stats, f, indent=4)

        logger.info(f"Episodes evaluated: {episodes_evaluated}")
        for k, v in aggregated_stats.items():
            logger.info(f"Average episode {k}: {v:.6f}")
            writer.add_scalar(f"eval_{split}_{k}", v, checkpoint_index + 1)
        return dict(aggregated_stats)

    # -- helpers -----------------------------------------------------------------------
    @staticmethod
    def _current_episode_info(envs) -> List[Dict]:
        """episode_id / tour_id of each lane's current episode."""
        return envs.call(["current_episode_info"] * envs.num_envs)


def _device_batch(batch: Dict) -> Dict:
    """Strip non-array entries before crossing into jit."""
    return {
        k: v
        for k, v in batch.items()
        if not isinstance(v, list) or not isinstance(v[0], str)
    }


def _is_torch_file(path: str) -> bool:
    try:
        import zipfile

        return zipfile.is_zipfile(path)
    except Exception:
        return False


def _merge_loaded_params(target, loaded):
    """Structural merge tolerant of numpy arrays from checkpoints."""
    from ivlnce_tpu.models.checkpoint_io import merge_params

    return merge_params(target, loaded)
