"""RedNet RGB-D semantic segmentation (inference path).

Reference: ivlnce_baselines/common/mapping_module/rednet.py — a
ResNet-50-encoder (two streams: RGB + depth, fused by addition) with a
TransBasicBlock decoder and "agant" skip fusions, 13 classes. The
reference always runs it frozen in eval mode from
data/rednet_mp3d_best_model.pkl (mapper.py:738-752), so only running-stat
BatchNorm inference is implemented.

Input normalization (mapper.py:715-736): RGB /255, bilinear-resized to the
depth resolution, ImageNet-normalized; depth normalized mean .213 std .285.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ivlnce_tpu.models import nn as F
from ivlnce_tpu.models import resnet as RN

Params = Dict

# numpy, not jnp: module-level device constants poison the axon dispatch
# fast path when captured into executables (see ops/scatter.py NEG_INF)
RGB_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
RGB_STD = np.array([0.229, 0.224, 0.225], np.float32)
DEPTH_MEAN = 0.213
DEPTH_STD = 0.285

LAYERS = [3, 4, 6, 3]
TRANS_LAYERS = [6, 4, 3, 3]  # deconv1..deconv4 block counts


# -----------------------------------------------------------------------------
# init
# -----------------------------------------------------------------------------
def _init_trans_basic_block(key, inplanes, planes, stride, upsample_kind):
    """upsample_kind: None | 'deconv' | 'conv'."""
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "conv1": F.init_conv2d(k1, inplanes, inplanes, 3, bias=False),
        "bn1": F.init_batchnorm(inplanes),
        "bn2": F.init_batchnorm(planes),
    }
    if upsample_kind == "deconv" and stride != 1:
        p["conv2"] = F.init_conv_transpose2d(k2, inplanes, planes, 3, bias=False)
    else:
        p["conv2"] = F.init_conv2d(k2, inplanes, planes, 3, bias=False)
    if upsample_kind == "deconv":
        p["upsample"] = {
            "0": F.init_conv_transpose2d(k3, inplanes, planes, 2, bias=False),
            "1": F.init_batchnorm(planes),
        }
    elif upsample_kind == "conv":
        p["upsample"] = {
            "0": F.init_conv2d(k3, inplanes, planes, 1, bias=False),
            "1": F.init_batchnorm(planes),
        }
    return p


def _init_transpose_stage(key, inplanes, planes, blocks, stride):
    """reference _make_transpose (rednet.py:116-151): blocks-1 identity
    blocks at inplanes, then one up/transition block to planes."""
    keys = jax.random.split(key, blocks)
    stage: Params = {}
    for bi in range(blocks - 1):
        stage[str(bi)] = _init_trans_basic_block(
            keys[bi], inplanes, inplanes, 1, None
        )
    if stride != 1:
        kind = "deconv"
    elif inplanes != planes:
        kind = "conv"
    else:
        kind = None
    stage[str(blocks - 1)] = _init_trans_basic_block(
        keys[-1], inplanes, planes, stride, kind
    )
    return stage, planes


def _init_agant(key, inplanes, planes):
    return {
        "0": F.init_conv2d(key, inplanes, planes, 1, bias=False),
        "1": F.init_batchnorm(planes),
    }


def init_rednet(key, num_classes: int = 13) -> Params:
    ks = jax.random.split(key, 20)
    p: Params = {
        "conv1": F.init_conv2d(ks[0], 3, 64, 7, bias=False),
        "bn1": F.init_batchnorm(64),
        "conv1_d": F.init_conv2d(ks[1], 1, 64, 7, bias=False),
        "bn1_d": F.init_batchnorm(64),
    }
    # encoder stages (standard bn resnet50 widths)
    def stages(keybase, suffix):
        inplanes = 64
        for si, (planes, blocks) in enumerate(
            zip([64, 128, 256, 512], LAYERS)
        ):
            stride = 1 if si == 0 else 2
            bkeys = jax.random.split(ks[keybase + si], blocks)
            stage: Params = {}
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                ds = bi == 0 and (s != 1 or inplanes != planes * 4)
                stage[str(bi)] = RN.init_bn_bottleneck(
                    bkeys[bi], inplanes, planes, s, ds
                )
                inplanes = planes * 4
            p[f"layer{si + 1}{suffix}"] = stage

    stages(2, "")
    stages(6, "_d")

    inplanes = 512
    for di, (planes, blocks) in enumerate(
        zip([256, 128, 64, 64], TRANS_LAYERS)
    ):
        p[f"deconv{di + 1}"], inplanes = _init_transpose_stage(
            ks[10 + di], inplanes, planes, blocks, stride=2
        )

    p["agant0"] = _init_agant(ks[14], 64, 64)
    p["agant1"] = _init_agant(ks[15], 64 * 4, 64)
    p["agant2"] = _init_agant(ks[16], 128 * 4, 128)
    p["agant3"] = _init_agant(ks[17], 256 * 4, 256)
    p["agant4"] = _init_agant(ks[18], 512 * 4, 512)

    p["final_conv"], inplanes = _init_transpose_stage(
        ks[19], 64, 64, 3, stride=1
    )
    p["final_deconv_custom"] = F.init_conv_transpose2d(
        jax.random.fold_in(key, 99), 64, num_classes, 2, bias=True
    )
    return p


# -----------------------------------------------------------------------------
# apply (inference)
# -----------------------------------------------------------------------------
def _apply_trans_basic_block(p: Params, x, stride):
    out = F.relu(F.batchnorm(p["bn1"], F.conv2d(p["conv1"], x, 1, 1)))
    # reference TransBasicBlock (rednet.py:326-337): conv2 is a transposed
    # conv exactly when the block has an upsample branch AND stride != 1
    if "upsample" in p and stride != 1:
        # ConvTranspose2d(k=3, s=2, p=1, op=1)
        out = F.conv_transpose2d(p["conv2"], out, stride, 1, 1)
    else:
        out = F.conv2d(p["conv2"], out, stride, 1)
    out = F.batchnorm(p["bn2"], out)
    if "upsample" in p:
        w = p["upsample"]["0"]["w"]
        if w.shape[0] == 2:  # ConvTranspose2d(k=2, s=2)
            identity = F.conv_transpose2d(p["upsample"]["0"], x, 2, 0, 0)
        else:  # 1x1 conv transition
            identity = F.conv2d(p["upsample"]["0"], x, 1, 0)
        identity = F.batchnorm(p["upsample"]["1"], identity)
    else:
        identity = x
    return F.relu(out + identity)


def _apply_transpose_stage(p: Params, x, stride):
    n = len(p)
    for bi in range(n - 1):
        x = _apply_trans_basic_block(p[str(bi)], x, 1)
    return _apply_trans_basic_block(p[str(n - 1)], x, stride)


def _apply_agant(p: Params, x):
    return F.relu(F.batchnorm(p["1"], F.conv2d(p["0"], x, 1, 0)))


def _apply_encoder_stage(stage: Params, x, first_stride):
    for bi in range(len(stage)):
        s = first_stride if bi == 0 else 1
        x = RN.apply_bn_bottleneck(stage[str(bi)], x, s)
    return x


def apply_rednet(p: Params, rgb_norm, depth_norm) -> jnp.ndarray:
    """Normalized NHWC rgb (B, H, W, 3) + depth (B, H, W, 1) -> class
    scores (B, H, W, C) (rednet.py:190-263 downsample+upsample)."""
    x = F.relu(F.batchnorm(p["bn1"], F.conv2d(p["conv1"], rgb_norm, 2, 3)))
    d = F.relu(
        F.batchnorm(p["bn1_d"], F.conv2d(p["conv1_d"], depth_norm, 2, 3))
    )
    fuse0 = x + d

    x = F.max_pool(fuse0, 3, 2, 1)
    d = F.max_pool(d, 3, 2, 1)

    x = _apply_encoder_stage(p["layer1"], x, 1)
    d = _apply_encoder_stage(p["layer1_d"], d, 1)
    fuse1 = x + d
    x = _apply_encoder_stage(p["layer2"], fuse1, 2)
    d = _apply_encoder_stage(p["layer2_d"], d, 2)
    fuse2 = x + d
    x = _apply_encoder_stage(p["layer3"], fuse2, 2)
    d = _apply_encoder_stage(p["layer3_d"], d, 2)
    fuse3 = x + d
    x = _apply_encoder_stage(p["layer4"], fuse3, 2)
    d = _apply_encoder_stage(p["layer4_d"], d, 2)
    fuse4 = x + d

    agant4 = _apply_agant(p["agant4"], fuse4)

    x = _apply_transpose_stage(p["deconv1"], agant4, 2)
    x = x + _apply_agant(p["agant3"], fuse3)
    x = _apply_transpose_stage(p["deconv2"], x, 2)
    x = x + _apply_agant(p["agant2"], fuse2)
    x = _apply_transpose_stage(p["deconv3"], x, 2)
    x = x + _apply_agant(p["agant1"], fuse1)
    x = _apply_transpose_stage(p["deconv4"], x, 2)
    x = x + _apply_agant(p["agant0"], fuse0)

    x = _apply_transpose_stage(p["final_conv"], x, 1)
    return F.conv_transpose2d(p["final_deconv_custom"], x, 2, 0, 0)


def bilinear_resize(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=False)
    equivalent: jax.image.resize 'linear' uses half-pixel centers too."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, hw[0], hw[1], c), method="linear")


def predict_semantics(
    p: Params,
    rgb_uint8: jnp.ndarray,
    depth_normalized: jnp.ndarray,
    dtype=None,
) -> jnp.ndarray:
    """Full PredictSemantics path (mapper.py:782-800): returns uint8 label
    maps (B, H, W) at the depth resolution. ``dtype`` runs the frozen
    encoder-decoder in low precision (TPU.compute_dtype); the argmax label
    output is integer either way."""
    hw = depth_normalized.shape[1:3]
    compute = dtype or jnp.float32
    if dtype is not None:
        from ivlnce_tpu.models import nn as _F

        p = _F.cast_tree(p, dtype)
    rgb = rgb_uint8.astype(compute) / 255.0
    rgb = bilinear_resize(rgb, hw)
    rgb = (rgb - RGB_MEAN.astype(compute)) / RGB_STD.astype(compute)
    if depth_normalized.ndim == 3:
        depth_normalized = depth_normalized[..., None]
    depth = (depth_normalized.astype(compute) - DEPTH_MEAN) / DEPTH_STD
    depth = depth.astype(compute)
    scores = apply_rednet(p, rgb, depth)
    return jnp.argmax(scores, axis=-1).astype(jnp.uint8)
