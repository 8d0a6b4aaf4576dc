"""Functional NN primitives with torch-compatible semantics.

Models in this framework are pure functions over parameter pytrees (plain
nested dicts of jnp arrays) — transparent for torch-checkpoint conversion,
trivially compatible with jit/vmap/scan/pjit and optax/orbax.

Layout conventions:
- activations are NHWC (TPU-native); torch checkpoints are converted once
  at load (OIHW -> HWIO) by models/checkpoint_io.py;
- linear weights keep the torch (out, in) layout, applied as x @ w.T;
- batchnorm params are {scale, bias, mean, var} (running statistics).

Initializers replicate torch defaults (kaiming-uniform fan-in for conv and
linear) so randomly initialized models match the reference's
initialization statistics.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]

# parity-critical matmuls run in full fp32 (see ops/geometry.py note);
# callers can lower precision via the dtype of the inputs instead.
_HIGHEST = jax.lax.Precision.HIGHEST


def _prec(x: jnp.ndarray):
    """HIGHEST for f32 parity paths; DEFAULT when the caller opted into a
    low-precision dtype (bf16 rides the MXU natively — HIGHEST on bf16
    would force the slow multi-pass f32 emulation again, ~200x slower for
    the conv encoders on v5e)."""
    return _HIGHEST if x.dtype == jnp.float32 else jax.lax.Precision.DEFAULT


def cast_tree(tree, dtype):
    """Cast all float leaves of a param pytree (int/bool leaves pass
    through). Used by the encoder compute_dtype path."""
    def leaf(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(leaf, tree)


# -----------------------------------------------------------------------------
# initializers (torch defaults)
# -----------------------------------------------------------------------------
def _kaiming_uniform(key, shape, fan_in, a=math.sqrt(5)):
    gain = math.sqrt(2.0 / (1 + a**2))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_linear(key, in_features: int, out_features: int, bias=True) -> Params:
    kw, kb = jax.random.split(key)
    p = {"w": _kaiming_uniform(kw, (out_features, in_features), in_features)}
    if bias:
        bound = 1 / math.sqrt(in_features)
        p["b"] = jax.random.uniform(
            kb, (out_features,), jnp.float32, -bound, bound
        )
    return p


def init_conv2d(
    key, in_ch: int, out_ch: int, kernel: int, bias=True, groups: int = 1
) -> Params:
    kw, kb = jax.random.split(key)
    fan_in = in_ch // groups * kernel * kernel
    p = {
        "w": _kaiming_uniform(
            kw, (kernel, kernel, in_ch // groups, out_ch), fan_in
        )
    }
    if bias:
        bound = 1 / math.sqrt(fan_in)
        p["b"] = jax.random.uniform(kb, (out_ch,), jnp.float32, -bound, bound)
    return p


def init_conv_transpose2d(
    key, in_ch: int, out_ch: int, kernel: int, bias=True
) -> Params:
    kw, kb = jax.random.split(key)
    # torch ConvTranspose2d weight: (in, out, kH, kW); we store HWOI
    # (kernel, kernel, out, in) for lax.conv_transpose rhs with
    # transpose_kernel=True semantics handled in apply.
    fan_in = out_ch * kernel * kernel  # torch uses weight.size(1)*k*k
    p = {
        "w": _kaiming_uniform(kw, (kernel, kernel, out_ch, in_ch), fan_in)
    }
    if bias:
        bound = 1 / math.sqrt(fan_in)
        p["b"] = jax.random.uniform(kb, (out_ch,), jnp.float32, -bound, bound)
    return p


def init_norm(ch: int) -> Params:
    return {
        "scale": jnp.ones((ch,), jnp.float32),
        "bias": jnp.zeros((ch,), jnp.float32),
    }


def init_batchnorm(ch: int) -> Params:
    p = init_norm(ch)
    p["mean"] = jnp.zeros((ch,), jnp.float32)
    p["var"] = jnp.ones((ch,), jnp.float32)
    return p


def init_embedding(key, num: int, dim: int, padding_idx: Optional[int] = None):
    w = jax.random.normal(key, (num, dim), jnp.float32)
    if padding_idx is not None:
        w = w.at[padding_idx].set(0.0)
    return {"w": w}


# -----------------------------------------------------------------------------
# apply functions
# -----------------------------------------------------------------------------
def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = jnp.matmul(x, p["w"].T, precision=_prec(x))
    if "b" in p:
        y = y + p["b"]
    return y


def conv2d(
    p: Params,
    x: jnp.ndarray,
    stride: int = 1,
    padding="SAME",
    groups: int = 1,
) -> jnp.ndarray:
    """NHWC conv. ``padding`` is an int (torch symmetric), "SAME" or
    "VALID"."""
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = jax.lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        precision=_prec(x),
    )
    if "b" in p:
        y = y + p["b"]
    return y


def conv1d(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Kernel-size-1 conv1d over (B, C, L) inputs — used by the reference's
    attention K/V projections (map_cma_policy.py:194-212). Equivalent to a
    linear map over the channel dim. Weight stored as (out, in)."""
    y = jnp.einsum("oc,bcl->bol", p["w"], x, precision=_prec(x))
    if "b" in p:
        y = y + p["b"][None, :, None]
    return y


def conv_transpose2d(
    p: Params,
    x: jnp.ndarray,
    stride: int,
    padding: int = 0,
    output_padding: int = 0,
) -> jnp.ndarray:
    """NHWC transposed conv matching torch ConvTranspose2d semantics.

    out = (in - 1) * stride - 2 * padding + kernel + output_padding
    """
    k = p["w"].shape[0]
    # lax.conv_transpose with transpose_kernel=True flips + swaps IO, which
    # matches the gradient-of-conv view torch uses. Our weight is HWOI
    # (kernel, kernel, out, in); conv_transpose wants HWIO of the forward
    # conv, i.e. (k, k, out_ch_of_transpose=..., ...) — pass as HWIO with
    # transpose_kernel=True: rhs shape (k, k, O, I) interpreted correctly.
    pad_lo = k - 1 - padding
    pad_hi = k - 1 - padding + output_padding
    y = jax.lax.conv_transpose(
        x,
        p["w"],
        strides=(stride, stride),
        padding=[(pad_lo, pad_hi), (pad_lo, pad_hi)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
        precision=_prec(x),
    )
    if "b" in p:
        y = y + p["b"]
    return y


def batchnorm(
    p: Params, x: jnp.ndarray, training: bool = False, eps: float = 1e-5
) -> jnp.ndarray:
    """BatchNorm over NHWC (stats per channel). In training mode uses
    batch statistics (running stats update handled by the caller via
    batchnorm_new_stats)."""
    if training:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axes)
        var = jnp.var(x, axes)
    else:
        mean, var = p["mean"], p["var"]
    inv = jax.lax.rsqrt(var + eps)
    return (x - mean) * inv * p["scale"] + p["bias"]


def batchnorm_new_stats(
    p: Params, x: jnp.ndarray, momentum: float = 0.1
) -> Params:
    """Return updated running statistics (torch momentum convention:
    new = (1 - m) * old + m * batch; var uses the unbiased estimate)."""
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x, axes)
    n = x.size // x.shape[-1]
    var = jnp.var(x, axes) * (n / max(n - 1, 1))
    return {
        **p,
        "mean": (1 - momentum) * p["mean"] + momentum * mean,
        "var": (1 - momentum) * p["var"] + momentum * var,
    }


def groupnorm(
    p: Params, x: jnp.ndarray, num_groups: int, eps: float = 1e-5
) -> jnp.ndarray:
    """GroupNorm over NHWC."""
    n, h, w, c = x.shape
    g = num_groups
    xg = x.reshape(n, h, w, g, c // g)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    return xg.reshape(n, h, w, c) * p["scale"] + p["bias"]


def max_pool(
    x: jnp.ndarray, kernel: int, stride: int, padding: int = 0
) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, kernel, kernel, 1),
        (1, stride, stride, 1),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)],
    )


def avg_pool(x: jnp.ndarray, kernel: int, stride: Optional[int] = None):
    stride = stride or kernel
    summed = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        (1, kernel, kernel, 1),
        (1, stride, stride, 1),
        "VALID",
    )
    return summed / (kernel * kernel)


def adaptive_avg_pool(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """torch adaptive_avg_pool2d bins: start = floor(i*in/out),
    end = ceil((i+1)*in/out). Static-shape unrolled (out is tiny: 4x4)."""
    n, h, w, c = x.shape
    oh, ow = out_hw
    rows = []
    for i in range(oh):
        r0, r1 = (i * h) // oh, -(-((i + 1) * h) // oh)
        cols = []
        for j in range(ow):
            c0, c1 = (j * w) // ow, -(-((j + 1) * w) // ow)
            cols.append(jnp.mean(x[:, r0:r1, c0:c1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (N, oh, ow, C)


def embedding(p: Params, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(p["w"], ids, axis=0)


def relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, 0)


def softmax(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return jax.nn.softmax(x, axis=axis)


def orthogonal_init(key, shape, gain: float = 1.0) -> jnp.ndarray:
    """torch nn.init.orthogonal_ equivalent."""
    n_rows, n_cols = shape[0], int(jnp.prod(jnp.array(shape[1:])))
    flat = (max(n_rows, n_cols), min(n_rows, n_cols))
    a = jax.random.normal(key, flat, jnp.float32)
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diagonal(r))
    if n_rows < n_cols:
        q = q.T
    return gain * q[:n_rows, :n_cols].reshape(shape)


def kaiming_normal_init(key, shape, fan_in, nonlinearity_gain: float):
    std = nonlinearity_gain / math.sqrt(fan_in)
    return std * jax.random.normal(key, shape, jnp.float32)
