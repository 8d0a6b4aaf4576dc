"""Latent CMA tour-memory variants: shapes, reset semantics, and the
memory slot behavior (reference latent_cma_policy.py:28-193, 395-497)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ivlnce_tpu.config import get_config
from ivlnce_tpu.models.policy import LatentCMAPolicy

B, DHW = 2, 64


def _policy(**model_flags):
    config = get_config().clone()
    config.defrost()
    config.MODEL.policy_name = "LatentCMAPolicy"
    config.MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings = False
    config.MODEL.INSTRUCTION_ENCODER.vocab_size = 16
    for k, v in model_flags.items():
        setattr(config.MODEL, k, v)
    config.freeze()
    return LatentCMAPolicy.from_config(config, {"depth_hw": DHW})


def _obs(rng):
    return {
        "instruction": jnp.asarray(
            rng.integers(1, 15, (B, 10)).astype(np.int32)
        ),
        "depth": jnp.asarray(rng.random((B, DHW, DHW, 1), np.float32)),
        "rgb": jnp.asarray(
            rng.integers(0, 255, (B, 64, 64, 3)).astype(np.uint8)
        ),
    }


def test_tour_memory_variant_has_extra_slot(rng):
    plain = _policy()
    variant = _policy(tour_memory_variant=True)
    assert plain.num_recurrent_layers == 2
    assert variant.num_recurrent_layers == 3


@pytest.mark.parametrize(
    "flags",
    [
        {},
        {"tour_memory": True},
        {"tour_memory_variant": True},
        {"tour_memory_variant": True, "memory_at_end": True},
    ],
)
def test_act_iterative_all_variants(rng, flags):
    policy = _policy(**flags)
    params = policy.init_params(jax.random.PRNGKey(0))
    obs = _obs(rng)
    rnn = policy.initial_rnn_states(B)
    prev = jnp.zeros((B, 1), jnp.int32)
    ones = jnp.ones((B, 1), jnp.float32)
    out = policy.act_iterative(
        params, obs, rnn, prev, ones, ones, ones, ones
    )
    assert out.actions.shape == (B, 1)
    assert out.rnn_states.shape == rnn.shape
    assert out.logits.shape == (B, 4)


def test_tour_memory_slot_resets_on_tour_boundary(rng):
    policy = _policy(tour_memory_variant=True)
    params = policy.init_params(jax.random.PRNGKey(0))
    obs = _obs(rng)
    prev = jnp.zeros((B, 1), jnp.int32)
    ones = jnp.ones((B, 1), jnp.float32)
    zeros = jnp.zeros((B, 1), jnp.float32)

    rnn = policy.initial_rnn_states(B)
    out1 = policy.act_iterative(
        params, obs, rnn, prev, ones, ones, ones, ones
    )
    # memory slot (last layer) populated by the max-pool update
    assert np.abs(np.asarray(out1.rnn_states[:, -1])).sum() > 0

    # tour boundary (tour mask 0) resets the memory slot before the step
    out_reset = policy.act_iterative(
        params, obs, out1.rnn_states, prev, zeros, zeros, zeros, ones
    )
    out_fresh = policy.act_iterative(
        params, obs, policy.initial_rnn_states(B), prev, zeros, zeros,
        zeros, ones,
    )
    np.testing.assert_allclose(
        np.asarray(out_reset.logits), np.asarray(out_fresh.logits),
        atol=1e-5,
    )


def test_build_distribution_shapes_with_tour_masks(rng):
    policy = _policy(tour_memory_variant=True)
    params = policy.init_params(jax.random.PRNGKey(0))
    T = 3
    obs = {
        "instruction": jnp.asarray(
            rng.integers(1, 15, (T * B, 10)).astype(np.int32)
        ),
        "depth": jnp.asarray(rng.random((T * B, DHW, DHW, 1), np.float32)),
        "rgb": jnp.asarray(
            rng.integers(0, 255, (T * B, 64, 64, 3)).astype(np.uint8)
        ),
    }
    prev = jnp.zeros((T * B, 1), jnp.int32)
    ep_masks = jnp.ones((T * B, 1), jnp.float32)
    tour_masks = jnp.ones((T * B, 1), jnp.float32)
    rnn = policy.initial_rnn_states(B)
    logits, feats, rnn_out = policy.build_distribution(
        params, obs, rnn, prev, ep_masks, tour_masks
    )
    assert logits.shape == (T * B, 4)
    assert rnn_out.shape == rnn.shape
