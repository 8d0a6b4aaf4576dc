"""Pallas window scatter-argmax kernel vs the XLA reference implementation
(interpret mode on the CPU backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ivlnce_tpu.ops import scatter as S
from ivlnce_tpu.ops.pallas_scatter import scatter_argmax_window_update


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_window_matches_xla_reference(rng, seed):
    rng = np.random.default_rng(seed)
    B, W, P, N = 2, 32, 3, 512
    wh = np.full((B, W, W), -np.inf, np.float32)
    wp = np.zeros((B, W, W, P), np.float32)
    # seed some incumbents
    wh[:, ::3, ::5] = rng.normal(size=wh[:, ::3, ::5].shape) * 0.3

    rows = rng.integers(0, W, (B, N)).astype(np.int32)
    cols = rng.integers(0, W, (B, N)).astype(np.int32)
    keys = rng.normal(size=(B, N)).astype(np.float32)
    pay = rng.normal(size=(B, N, P)).astype(np.float32)
    valid = rng.random((B, N)) > 0.25

    got_h, got_p = scatter_argmax_window_update(
        jnp.asarray(wh), jnp.asarray(wp), jnp.asarray(rows),
        jnp.asarray(cols), jnp.asarray(keys), jnp.asarray(pay),
        jnp.asarray(valid), interpret=True,
    )
    ref_h, ref_p = S.scatter_argmax_grid_update(
        jnp.asarray(wh), jnp.asarray(wp), jnp.asarray(rows),
        jnp.asarray(cols), jnp.asarray(keys), jnp.asarray(pay),
        jnp.asarray(valid),
    )
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(ref_h))
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(ref_p))


def test_pallas_window_tie_semantics(rng):
    """Ties keep the incumbent; among equal new points the lowest index
    wins — the documented parity rule."""
    B, W, P = 1, 8, 1
    wh = np.full((B, W, W), -np.inf, np.float32)
    wh[0, 2, 2] = 1.0
    wp = np.zeros((B, W, W, P), np.float32)
    wp[0, 2, 2, 0] = 111.0

    rows = np.array([[2, 2, 3, 3]], np.int32)
    cols = np.array([[2, 2, 3, 3]], np.int32)
    keys = np.array([[1.0, 2.0, 5.0, 5.0]], np.float32)
    pay = np.array([[[10.0], [20.0], [30.0], [40.0]]], np.float32)
    valid = np.ones((1, 4), bool)

    got_h, got_p = scatter_argmax_window_update(
        jnp.asarray(wh), jnp.asarray(wp), jnp.asarray(rows),
        jnp.asarray(cols), jnp.asarray(keys), jnp.asarray(pay),
        jnp.asarray(valid), interpret=True,
    )
    got_h, got_p = np.asarray(got_h), np.asarray(got_p)
    # equal to incumbent (1.0) does not replace; 2.0 does
    assert got_h[0, 2, 2] == 2.0 and got_p[0, 2, 2, 0] == 20.0
    # among two equal new points, the first (lowest index) wins
    assert got_h[0, 3, 3] == 5.0 and got_p[0, 3, 3, 0] == 30.0
