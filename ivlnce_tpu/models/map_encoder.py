"""Semantic map encoder (reference:
ivlnce_baselines/models/encoders/map_encoder.py).

4x CBRA blocks (7x7 same conv -> BatchNorm -> ReLU -> 2x2 avg pool) over a
14-channel input (1 occupancy + 13 one-hot semantic classes).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ivlnce_tpu.models import nn as F

Params = Dict


def init_map_encoder(
    key,
    map_hw: Tuple[int, int],
    num_semantic_classes: int = 13,
    ch: int = 32,
    last_ch_mult: int = 4,
) -> Tuple[Params, Tuple[int, int, int]]:
    in_ch = 1 + num_semantic_classes
    widths = [ch, ch * 2, ch * 4, ch * last_ch_mult]
    keys = jax.random.split(key, 4)
    cnn: Params = {}
    prev = in_ch
    for i, w in enumerate(widths):
        cnn[str(i)] = {
            "conv": {
                "0": F.init_conv2d(keys[i], prev, w, 7, bias=True),
                "1": F.init_batchnorm(w),
            }
        }
        prev = w
    out_shape = (widths[-1], map_hw[0] // 16, map_hw[1] // 16)
    return {"cnn": cnn}, out_shape


def apply_map_encoder(
    params: Params,
    occupancy_map: jnp.ndarray,  # (B, R, C) uint8
    semantic_map: jnp.ndarray,  # (B, R, C) uint8
    num_semantic_classes: int = 13,
    training: bool = False,
    dtype=None,
) -> jnp.ndarray:
    """Returns (B, C_out, R/16, C/16) channel-first features.

    training=True uses batch statistics (the reference's map encoder is
    trainable by default with live BatchNorm; running-stat updates are
    returned by map_encoder_new_stats). ``dtype`` optionally runs the conv
    stack in low precision (TPU.compute_dtype); output is cast to f32."""
    compute = dtype or jnp.float32
    occ = occupancy_map.astype(compute)[..., None]  # (B, R, C, 1)
    sem = jax.nn.one_hot(
        semantic_map.astype(jnp.int32), num_semantic_classes, dtype=compute
    )
    x = jnp.concatenate([occ, sem], axis=-1)  # NHWC, 14 channels
    cnn = params["cnn"]
    if dtype is not None:
        cnn = F.cast_tree(cnn, dtype)
    for i in range(len(cnn)):
        blk = cnn[str(i)]["conv"]
        x = F.conv2d(blk["0"], x, 1, 3)
        x = F.relu(F.batchnorm(blk["1"], x, training=training))
        x = F.avg_pool(x, 2)
    return x.astype(jnp.float32).transpose(0, 3, 1, 2)


def map_encoder_new_stats(
    params: Params,
    occupancy_map: jnp.ndarray,
    semantic_map: jnp.ndarray,
    num_semantic_classes: int = 13,
) -> Params:
    """Recompute running BatchNorm statistics for a training step."""
    occ = occupancy_map.astype(jnp.float32)[..., None]
    sem = jax.nn.one_hot(
        semantic_map.astype(jnp.int32), num_semantic_classes, dtype=jnp.float32
    )
    x = jnp.concatenate([occ, sem], axis=-1)
    cnn = dict(params["cnn"])
    for i in range(len(cnn)):
        blk = dict(cnn[str(i)]["conv"])
        pre = F.conv2d(blk["0"], x, 1, 3)
        blk["1"] = F.batchnorm_new_stats(blk["1"], pre)
        x = F.avg_pool(F.relu(F.batchnorm(blk["1"], pre, training=True)), 2)
        cnn[str(i)] = {"conv": blk}
    return {"cnn": cnn}
