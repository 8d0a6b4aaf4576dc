"""Fused Pallas GRU cell vs the reference jnp implementation."""

import numpy as np

import jax
import jax.numpy as jnp

from ivlnce_tpu.models import rnn as R
from ivlnce_tpu.ops.pallas_gru import masked_gru_step_pallas


def test_pallas_gru_matches_reference(rng):
    B, I, H = 8, 416, 512
    p = R.init_gru_cell(jax.random.PRNGKey(0), I, H)
    x = jnp.asarray(rng.normal(size=(B, I)).astype(np.float32))
    h = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    mask = jnp.asarray((rng.random(B) > 0.5).astype(np.float32))

    ref = R.masked_gru_step(p, x, h, mask)
    got = masked_gru_step_pallas(p, x, h, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pallas_gru_mask_restarts(rng):
    B, I, H = 4, 32, 64
    p = R.init_gru_cell(jax.random.PRNGKey(1), I, H)
    x = jnp.asarray(rng.normal(size=(B, I)).astype(np.float32))
    h = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))

    all_zero = masked_gru_step_pallas(
        p, x, h, jnp.zeros(B), interpret=True
    )
    from_zero_state = masked_gru_step_pallas(
        p, x, jnp.zeros_like(h), jnp.ones(B), interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(all_zero), np.asarray(from_zero_state), atol=1e-6
    )
