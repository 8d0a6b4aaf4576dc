"""IL policies: categorical action head + act / act_iterative /
build_distribution (reference: ivlnce_baselines/models/policy.py:12-83,
map_cma_policy.py:28-100, latent_cma_policy.py:28-193).

Policies are thin stateless wrappers binding a network's pure functions to
a config; parameters travel separately (pytree) so the whole act path jits
and shards cleanly.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ivlnce_tpu.models import cma as C
from ivlnce_tpu.models import nn as F
from ivlnce_tpu.utils.registry import registry

Params = Dict

NUM_ACTIONS = 4  # STOP, MOVE_FORWARD, TURN_LEFT, TURN_RIGHT


def init_categorical_head(key, num_inputs: int, num_actions: int) -> Params:
    """orthogonal(gain=0.01) weight, zero bias (common/utils.py:172-180)."""
    return {
        "linear": {
            "w": F.orthogonal_init(key, (num_actions, num_inputs), gain=0.01),
            "b": jnp.zeros((num_actions,), jnp.float32),
        }
    }


def action_logits(head: Params, features: jnp.ndarray) -> jnp.ndarray:
    return F.linear(head["linear"], features)


def categorical_mode(logits: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(logits, axis=-1, keepdims=True)


def categorical_sample(key, logits: jnp.ndarray) -> jnp.ndarray:
    return jax.random.categorical(key, logits, axis=-1)[..., None]


class PolicyOutput(NamedTuple):
    actions: jnp.ndarray  # (N, 1) int32
    rnn_states: jnp.ndarray  # (N, L, H)
    logits: jnp.ndarray  # (N, A)


class _CMAPolicyBase:
    """Shared act plumbing. Subclasses define net_* hooks."""

    def __init__(self, config, observation_info: Dict):
        self.config = config
        # both CMA nets force per-token instruction features
        # (map_cma_policy.py:116-118, latent_cma_policy.py:209-211)
        model_config = config.MODEL.clone()
        model_config.INSTRUCTION_ENCODER.final_state_only = False
        # thread the TPU compute dtype onto the model config so the pure
        # net functions see it (bf16 encoder path, models/cma.py)
        model_config.compute_dtype = (
            config.TPU.compute_dtype if "TPU" in config else "float32"
        )
        self.model_config = model_config.freeze()
        self.observation_info = observation_info
        # frames per rematerialized encoder chunk during BPTT (0 = off;
        # TPU.train_encode_chunk — see config/default.py for the
        # memory/FLOPs trade and the trainable-map-BN caveat)
        self.encode_chunk = int(
            config.TPU.train_encode_chunk if "TPU" in config else 0
        )

    # -- hooks ---------------------------------------------------------------
    def net_init(self, key) -> Params:
        raise NotImplementedError

    def net_encode(self, params, obs, prev_actions, action_masks, training):
        raise NotImplementedError

    def net_step(self, params, feats, rnn_states, episode_masks, tour_masks):
        raise NotImplementedError

    @property
    def num_recurrent_layers(self) -> int:
        raise NotImplementedError

    @property
    def hidden_size(self) -> int:
        return self.model_config.STATE_ENCODER.hidden_size

    # -- init ------------------------------------------------------------------
    def init_params(self, key) -> Params:
        k_net, k_head = jax.random.split(key)
        params = self.net_init(k_net)
        params["action_distribution"] = init_categorical_head(
            k_head, self.hidden_size, NUM_ACTIONS
        )
        return params

    def initial_rnn_states(self, batch_size: int) -> jnp.ndarray:
        return jnp.zeros(
            (batch_size, self.num_recurrent_layers, self.hidden_size),
            jnp.float32,
        )

    # -- iterative mask selection (overridden by LatentCMA) ------------------
    def _iterative_masks(
        self, agent_masks, sim_masks, tour_masks
    ) -> Tuple[Optional[jnp.ndarray], Optional[jnp.ndarray]]:
        """(episode_masks, tour_masks) for act_iterative. MapCMA resets its
        GRUs at agent-episode boundaries (map_cma_policy.py:45-71 passes
        episode_masks=None -> action_masks)."""
        return None, None

    # -- forward --------------------------------------------------------------
    def act(
        self,
        params: Params,
        observations: Dict[str, jnp.ndarray],
        rnn_states: jnp.ndarray,
        prev_actions: jnp.ndarray,
        masks: jnp.ndarray,
        rng_key=None,
        deterministic: bool = True,
    ) -> PolicyOutput:
        feats = self.net_encode(
            params, observations, prev_actions, masks, False
        )
        features, rnn_out = self.net_step(
            params, feats, rnn_states, masks.reshape(-1), None
        )
        logits = action_logits(params["action_distribution"], features)
        if deterministic:
            actions = categorical_mode(logits)
        else:
            actions = categorical_sample(rng_key, logits)
        return PolicyOutput(actions, rnn_out, logits)

    def act_iterative(
        self,
        params: Params,
        observations: Dict[str, jnp.ndarray],
        rnn_states: jnp.ndarray,
        prev_actions: jnp.ndarray,
        agent_episode_not_done_masks: jnp.ndarray,
        sim_episode_not_done_masks: jnp.ndarray,
        tour_not_done_masks: jnp.ndarray,
        action_masks: jnp.ndarray,
        rng_key=None,
        deterministic: bool = True,
    ) -> PolicyOutput:
        agent_masks = agent_episode_not_done_masks.reshape(-1)
        episode_masks, tour_masks = self._iterative_masks(
            agent_masks,
            sim_episode_not_done_masks.reshape(-1),
            tour_not_done_masks.reshape(-1),
        )
        if episode_masks is None:
            episode_masks = agent_masks
        feats = self.net_encode(
            params, observations, prev_actions, agent_masks, False
        )
        features, rnn_out = self.net_step(
            params, feats, rnn_states, episode_masks, tour_masks
        )
        logits = action_logits(params["action_distribution"], features)
        if deterministic:
            actions = categorical_mode(logits)
        else:
            actions = categorical_sample(rng_key, logits)
        return PolicyOutput(actions, rnn_out, logits)

    def build_distribution(
        self,
        params: Params,
        observations: Dict[str, jnp.ndarray],
        rnn_states: jnp.ndarray,  # (N, L, H)
        prev_actions: jnp.ndarray,  # (T*N, 1)
        agent_episode_not_done_masks: jnp.ndarray,  # (T*N, 1)
        tour_not_done_masks: Optional[jnp.ndarray] = None,
        training: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Sequence forward over T*N flattened inputs (the trainers' BPTT
        path, base_il_trainer.py:173-219). Encoders run batched over T*N;
        the recurrent step scans over T.

        Returns (logits (T*N, A), features (T*N, H), final rnn_states).
        """
        n = rnn_states.shape[0]
        tn = agent_episode_not_done_masks.reshape(-1).shape[0]
        t = tn // n

        agent_masks = agent_episode_not_done_masks.reshape(t, n)
        if tour_not_done_masks is None:
            tour_masks_t = agent_masks
        else:
            tour_masks_t = tour_not_done_masks.reshape(t, n)

        episode_masks_t, tour_masks_t = self._training_masks(
            agent_masks, tour_masks_t
        )

        feats = self._encode_seq(
            params,
            observations,
            prev_actions,
            agent_masks.reshape(-1),
            training,
            tn,
        )
        feats_t = jax.tree_util.tree_map(
            lambda a: a.reshape((t, n) + a.shape[1:]), feats
        )

        def step(carry, inp):
            f_t, em, tm = inp
            features, rnn_out = self.net_step(params, f_t, carry, em, tm)
            return rnn_out, features

        rnn_final, features_t = jax.lax.scan(
            step, rnn_states, (feats_t, episode_masks_t, tour_masks_t)
        )
        features = features_t.reshape(t * n, -1)
        logits = action_logits(params["action_distribution"], features)
        return logits, features, rnn_final

    def _training_masks(self, agent_masks_t, tour_masks_t):
        """(episode, tour) per-step training masks; MapCMA resets on agent
        episode boundaries."""
        return agent_masks_t, tour_masks_t

    def _encode_seq(
        self, params, observations, prev_actions, masks, training, tn
    ):
        """net_encode over T*N flattened rows, optionally chunked +
        rematerialized (TPU.train_encode_chunk).

        With chunking on, the encoders run as a lax.scan over
        ceil(tn/chunk) jax.checkpoint'd chunks: only the (small) CMA
        feature outputs are stored across the scan, and the backward
        pass recomputes each chunk's encoder activations in turn — the
        peak-HBM term drops from O(tn) stored ResNet activations to
        O(chunk). Rows are zero-padded up to a whole number of chunks
        (static shapes for XLA); padded rows are sliced off the outputs
        and never reach the loss.
        """
        chunk = self.encode_chunk
        if not training or chunk <= 0 or tn <= chunk:
            return self.net_encode(
                params, observations, prev_actions, masks, training
            )
        k = -(-tn // chunk)
        pad = k * chunk - tn

        def _chunked(a):
            if pad:
                a = jnp.concatenate(
                    [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], 0
                )
            return a.reshape((k, chunk) + a.shape[1:])

        obs_c = jax.tree_util.tree_map(_chunked, dict(observations))
        pa_c = _chunked(prev_actions)
        m_c = _chunked(masks.reshape(-1))

        @jax.checkpoint
        def encode_chunk(o, pa, m):
            return self.net_encode(params, o, pa, m, training)

        def body(carry, inp):
            o, pa, m = inp
            return carry, encode_chunk(o, pa, m)

        _, feats_k = jax.lax.scan(body, (), (obs_c, pa_c, m_c))
        return jax.tree_util.tree_map(
            lambda a: a.reshape((k * chunk,) + a.shape[2:])[:tn], feats_k
        )


@registry.register_policy(name="MapCMAPolicy")
class MapCMAPolicy(_CMAPolicyBase):
    # sensors the act executable reads (map_cma_encode: depth +
    # occupancy/semantic maps + cached instruction features) — the
    # upload filter (utils/batching.wire_obs_keys) keeps everything else
    # (rgb!) off the host->device wire. When a mapper transform is
    # fused, the trainer separately excludes the map keys (the
    # executable recomputes them on device from carried state).
    device_obs_keys = frozenset({"depth", "occupancy_map", "semantic_map"})

    def net_init(self, key) -> Params:
        return C.init_map_cma(
            key,
            self.model_config,
            self.observation_info["depth_hw"],
            self.observation_info["map_hw"],
        )

    def net_encode(self, params, obs, prev_actions, action_masks, training):
        return C.map_cma_encode(
            params, self.model_config, obs, prev_actions, action_masks,
            training,
        )

    def net_step(self, params, feats, rnn_states, episode_masks, tour_masks):
        return C.map_cma_step(
            params, self.model_config, feats, rnn_states, episode_masks,
            tour_masks,
        )

    @property
    def num_recurrent_layers(self) -> int:
        return C.map_cma_num_recurrent_layers(self.model_config)

    @classmethod
    def from_config(cls, config, observation_info):
        return cls(config, observation_info)


@registry.register_policy(name="LatentCMAPolicy")
class LatentCMAPolicy(_CMAPolicyBase):
    # latent_cma_encode reads depth + rgb (+ cached instruction features)
    device_obs_keys = frozenset({"depth", "rgb"})

    def net_init(self, key) -> Params:
        return C.init_latent_cma(
            key, self.model_config, self.observation_info["depth_hw"]
        )

    def net_encode(self, params, obs, prev_actions, action_masks, training):
        return C.latent_cma_encode(
            params, self.model_config, obs, prev_actions, action_masks,
            training,
        )

    def net_step(self, params, feats, rnn_states, episode_masks, tour_masks):
        return C.latent_cma_step(
            params, self.model_config, feats, rnn_states, episode_masks,
            tour_masks,
        )

    @property
    def num_recurrent_layers(self) -> int:
        return C.latent_cma_num_recurrent_layers(self.model_config)

    def _iterative_masks(self, agent_masks, sim_masks, tour_masks):
        """latent_cma_policy.py:48-88: tour_memory resets RNN only at tour
        boundaries; tour_memory_variant keeps episodic resets + a tour
        memory slot."""
        cfg = self.model_config
        if cfg.tour_memory_variant:
            return agent_masks, tour_masks
        if cfg.tour_memory:
            return tour_masks, None
        return None, None

    def _training_masks(self, agent_masks_t, tour_masks_t):
        cfg = self.model_config
        if cfg.tour_memory_variant:
            return agent_masks_t, tour_masks_t
        if cfg.tour_memory:
            return tour_masks_t, tour_masks_t
        return agent_masks_t, tour_masks_t

    @classmethod
    def from_config(cls, config, observation_info):
        return cls(config, observation_info)
