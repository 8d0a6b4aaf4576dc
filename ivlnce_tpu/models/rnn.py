"""Recurrent cells with torch weight layouts + masked state carry.

Replaces habitat-baselines' RNNStateEncoder (used by the reference via
build_rnn_state_encoder, map_cma_policy.py:180-185) and torch's
packed-sequence bi-LSTM (instruction_encoder.py:80-94).

Weight layout matches torch nn.GRU/nn.LSTM exactly so checkpoints convert
1:1: w_ih (G*H, I), w_hh (G*H, H), b_ih, b_hh with gate order [r, z, n]
for GRU and [i, f, g, o] for LSTM.

Masked semantics (habitat RNNStateEncoder): hidden states are multiplied
by not-done masks BEFORE each step, so mask==0 restarts the recurrence.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ivlnce_tpu.models import nn as F

Params = Dict[str, jnp.ndarray]


def init_gru_cell(key, input_size: int, hidden_size: int) -> Params:
    import math

    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1 / math.sqrt(hidden_size)

    def u(k, shape):
        return jax.random.uniform(k, shape, jnp.float32, -bound, bound)

    return {
        "w_ih": u(k1, (3 * hidden_size, input_size)),
        "w_hh": u(k2, (3 * hidden_size, hidden_size)),
        "b_ih": u(k3, (3 * hidden_size,)),
        "b_hh": u(k4, (3 * hidden_size,)),
    }


def init_lstm_cell(key, input_size: int, hidden_size: int) -> Params:
    import math

    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1 / math.sqrt(hidden_size)

    def u(k, shape):
        return jax.random.uniform(k, shape, jnp.float32, -bound, bound)

    return {
        "w_ih": u(k1, (4 * hidden_size, input_size)),
        "w_hh": u(k2, (4 * hidden_size, hidden_size)),
        "b_ih": u(k3, (4 * hidden_size,)),
        "b_hh": u(k4, (4 * hidden_size,)),
    }


def gru_cell(p: Params, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """torch nn.GRU cell: gates ordered [r, z, n]; note the r-gated
    hidden contribution applies to (W_hn h + b_hn) only."""
    gi = F.linear({"w": p["w_ih"], "b": p["b_ih"]}, x)
    gh = F.linear({"w": p["w_hh"], "b": p["b_hh"]}, h)
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1 - z) * n + z * h


def lstm_cell(
    p: Params, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """torch nn.LSTM cell: gates ordered [i, f, g, o]."""
    gi = F.linear({"w": p["w_ih"], "b": p["b_ih"]}, x)
    gh = F.linear({"w": p["w_hh"], "b": p["b_hh"]}, h)
    i, f, g, o = jnp.split(gi + gh, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    return o * jnp.tanh(c_new), c_new


def masked_gru_step(
    p: Params, x: jnp.ndarray, h: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Single step with not-done mask applied to the incoming hidden state
    (habitat RNNStateEncoder.single_forward semantics)."""
    return gru_cell(p, x, h * mask.reshape(-1, 1))


def gru_sequence(
    p: Params,
    xs: jnp.ndarray,  # (T, B, I)
    h0: jnp.ndarray,  # (B, H)
    masks: jnp.ndarray,  # (T, B) not-done masks
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scan a masked GRU over time. Returns (outputs (T, B, H), h_T).

    Equivalent to habitat's seq_forward (which splits the batch at
    mask==0 boundaries); masking the carried state per step is the same
    recurrence without host-side splitting — XLA-friendly."""

    def step(h, inp):
        x, m = inp
        h_new = gru_cell(p, x, h * m[:, None])
        return h_new, h_new

    h_t, ys = jax.lax.scan(step, h0, (xs, masks))
    return ys, h_t


def bi_lstm_padded(
    p_fwd: Params,
    p_bwd: Params,
    xs: jnp.ndarray,  # (B, T, I) padded sequences
    lengths: jnp.ndarray,  # (B,) int32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bidirectional LSTM over padded sequences, replicating torch
    pack_padded_sequence -> LSTM -> pad_packed_sequence:

    - forward direction ignores padded steps (state held, outputs zeroed);
    - backward direction processes each row from t = len-1 down to 0, so
      its output at t covers positions t..len-1 (NOT a plain reversed
      scan over the padded buffer);
    - padded output positions are exactly 0 (pad_packed_sequence default);
    - final hidden state is taken at each sequence's own last step.

    Returns (outputs (B, T, 2H), final_hidden (B, 2H)).
    """
    b, t, _ = xs.shape
    hidden = p_fwd["w_hh"].shape[1]
    time_idx = jnp.arange(t)[None, :]  # (1, T)
    valid = time_idx < lengths[:, None]  # (B, T)

    def run(p, seq, keep):
        """Scan an LSTM holding state on padded steps."""

        def step(carry, inp):
            h, c = carry
            x, m = inp  # m: (B,)
            h_new, c_new = lstm_cell(p, x, h, c)
            m1 = m[:, None]
            h = jnp.where(m1, h_new, h)
            c = jnp.where(m1, c_new, c)
            return (h, c), jnp.where(m1, h_new, 0.0)

        h0 = jnp.zeros((b, hidden), xs.dtype)
        (h_t, _), ys = jax.lax.scan(
            step, (h0, h0), (seq.swapaxes(0, 1), keep.swapaxes(0, 1))
        )
        return ys.swapaxes(0, 1), h_t  # (B, T, H), (B, H)

    out_f, h_f = run(p_fwd, xs, valid)

    # reverse each row within its own length: index len-1-t for t < len
    rev_idx = jnp.clip(lengths[:, None] - 1 - time_idx, 0, t - 1)  # (B, T)
    xs_rev = jnp.take_along_axis(xs, rev_idx[:, :, None], axis=1)
    out_b_rev, h_b = run(p_bwd, xs_rev, valid)
    out_b = jnp.take_along_axis(out_b_rev, rev_idx[:, :, None], axis=1)
    out_b = jnp.where(valid[:, :, None], out_b, 0.0)

    outputs = jnp.concatenate([out_f, out_b], axis=-1)
    final = jnp.concatenate([h_f, h_b], axis=-1)
    return outputs, final
