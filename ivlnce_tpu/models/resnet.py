"""ResNet visual encoders.

Two families, both functional over nested param dicts whose structure
mirrors the torch state_dict names 1:1 (see models/checkpoint_io.py):

1. DDPPO GroupNorm ResNet + ResNetEncoder — the depth encoder backbone
   (reference: ivlnce_baselines/models/encoders/resnet_encoders.py:17-115
   wraps habitat_baselines.rl.ddppo.policy.resnet.resnet50 with
   baseplanes=32, ngroups=16; habitat-lab v0.1.7 structure: conv1 is
   [conv7x7 s2, GN, ReLU], maxpool3x3 s2, four bottleneck stages with
   stage widths (32, 64, 128, 256) x expansion 4, then a 3x3 compression
   conv + GN(1) + ReLU down to round(2048 / final_spatial^2) channels).
2. Standard torchvision ResNet-50 (BatchNorm bottleneck) — the frozen
   ImageNet RGB encoder (resnet_encoders.py:118-229) and the RedNet
   encoder streams.

Inputs/activations are NHWC.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ivlnce_tpu.models import nn as F

Params = Dict

RESNET50_LAYERS = [3, 4, 6, 3]


# -----------------------------------------------------------------------------
# DDPPO GroupNorm ResNet (depth)
# -----------------------------------------------------------------------------
def init_gn_bottleneck(
    key, inplanes: int, planes: int, stride: int, downsample: bool
) -> Params:
    ks = jax.random.split(key, 4)
    p = {
        "convs": {
            "0": F.init_conv2d(ks[0], inplanes, planes, 1, bias=False),
            "1": F.init_norm(planes),
            "3": F.init_conv2d(ks[1], planes, planes, 3, bias=False),
            "4": F.init_norm(planes),
            "6": F.init_conv2d(ks[2], planes, planes * 4, 1, bias=False),
            "7": F.init_norm(planes * 4),
        }
    }
    if downsample:
        p["downsample"] = {
            "0": F.init_conv2d(ks[3], inplanes, planes * 4, 1, bias=False),
            "1": F.init_norm(planes * 4),
        }
    return p


def apply_gn_bottleneck(
    p: Params, x: jnp.ndarray, ngroups: int, stride: int
) -> jnp.ndarray:
    out = F.conv2d(p["convs"]["0"], x, 1, 0)
    out = F.relu(F.groupnorm(p["convs"]["1"], out, ngroups))
    out = F.conv2d(p["convs"]["3"], out, stride, 1)
    out = F.relu(F.groupnorm(p["convs"]["4"], out, ngroups))
    out = F.conv2d(p["convs"]["6"], out, 1, 0)
    out = F.groupnorm(p["convs"]["7"], out, ngroups)
    if "downsample" in p:
        identity = F.conv2d(p["downsample"]["0"], x, stride, 0)
        identity = F.groupnorm(p["downsample"]["1"], identity, ngroups)
    else:
        identity = x
    return F.relu(out + identity)


def init_gn_resnet(
    key, in_channels: int, base_planes: int = 32, ngroups: int = 16
) -> Params:
    keys = jax.random.split(key, 5)
    p: Params = {
        "conv1": {
            "0": F.init_conv2d(keys[0], in_channels, base_planes, 7, bias=False),
            "1": F.init_norm(base_planes),
        }
    }
    inplanes = base_planes
    stage_planes = [base_planes, base_planes * 2, base_planes * 4, base_planes * 8]
    for si, (planes, blocks) in enumerate(zip(stage_planes, RESNET50_LAYERS)):
        stride = 1 if si == 0 else 2
        bkeys = jax.random.split(keys[si + 1], blocks)
        stage: Params = {}
        for bi in range(blocks):
            s = stride if bi == 0 else 1
            ds = bi == 0 and (s != 1 or inplanes != planes * 4)
            stage[str(bi)] = init_gn_bottleneck(bkeys[bi], inplanes, planes, s, ds)
            inplanes = planes * 4
        p[f"layer{si + 1}"] = stage
    return p


def apply_gn_resnet(
    p: Params, x: jnp.ndarray, ngroups: int = 16
) -> jnp.ndarray:
    x = F.conv2d(p["conv1"]["0"], x, stride=2, padding=3)
    x = F.relu(F.groupnorm(p["conv1"]["1"], x, ngroups))
    x = F.max_pool(x, 3, 2, 1)
    for si in range(4):
        stage = p[f"layer{si + 1}"]
        for bi in range(len(stage)):
            stride = (2 if si > 0 else 1) if bi == 0 else 1
            x = apply_gn_bottleneck(stage[str(bi)], x, ngroups, stride)
    return x


def init_resnet_encoder(
    key,
    spatial_size: int,
    in_channels: int = 1,
    base_planes: int = 32,
    ngroups: int = 16,
) -> Tuple[Params, Tuple[int, int, int]]:
    """habitat ResNetEncoder: avg_pool2d(input, 2) -> backbone -> 3x3
    compression conv. spatial_size = sensor H // 2."""
    k1, k2 = jax.random.split(key)
    final_spatial = int(spatial_size * (1.0 / 32))
    num_compression = int(round(2048 / (final_spatial**2)))
    final_channels = base_planes * 8 * 4
    p = {
        "backbone": init_gn_resnet(k1, in_channels, base_planes, ngroups),
        "compression": {
            "0": F.init_conv2d(k2, final_channels, num_compression, 3, bias=False),
            "1": F.init_norm(num_compression),
        },
    }
    return p, (num_compression, final_spatial, final_spatial)


def apply_resnet_encoder(
    p: Params, depth_nhwc: jnp.ndarray, ngroups: int = 16
) -> jnp.ndarray:
    """depth (B, H, W, 1) in [0, 1] -> features (B, h, w, C)."""
    x = F.avg_pool(depth_nhwc, 2)
    x = apply_gn_resnet(p["backbone"], x, ngroups)
    x = F.conv2d(p["compression"]["0"], x, 1, 1)
    x = F.relu(F.groupnorm(p["compression"]["1"], x, 1))
    return x


def init_vln_depth_encoder(
    key, spatial_size: int, spatial_embedding_dim: int = 64
) -> Tuple[Params, Tuple[int, int, int]]:
    """VlnResnetDepthEncoder with spatial_output=True
    (resnet_encoders.py:74-83): ResNetEncoder features + a learned
    per-cell spatial embedding concatenated on channels."""
    k1, k2 = jax.random.split(key)
    enc, (c, h, w) = init_resnet_encoder(k1, spatial_size)
    p = {
        "visual_encoder": enc,
        "spatial_embeddings": F.init_embedding(k2, h * w, spatial_embedding_dim),
    }
    return p, (c + spatial_embedding_dim, h, w)


def apply_vln_depth_encoder(
    p: Params, depth_nhwc: jnp.ndarray, dtype=None
) -> jnp.ndarray:
    """Returns (B, C + 64, h, w) channel-first like the reference (the CMA
    nets flatten dims 2+).

    ``dtype`` (e.g. jnp.bfloat16, config TPU.compute_dtype) runs the conv
    backbone in low precision on the MXU (~200x faster than f32 on v5e);
    outputs are cast back to f32 for the parity-sensitive head."""
    if dtype is not None:
        p = F.cast_tree(p, dtype)
        depth_nhwc = depth_nhwc.astype(dtype)
    x = apply_resnet_encoder(p["visual_encoder"], depth_nhwc)  # (B, h, w, C)
    x = x.astype(jnp.float32)
    b, h, w, c = x.shape
    x = x.transpose(0, 3, 1, 2)  # (B, C, h, w)
    emb = p["spatial_embeddings"]["w"]  # (h*w, D)
    spatial = emb.T.reshape(1, -1, h, w)
    spatial = jnp.broadcast_to(spatial, (b, emb.shape[1], h, w))
    return jnp.concatenate([x, spatial], axis=1)


# -----------------------------------------------------------------------------
# torchvision ResNet-50 (BatchNorm) — RGB encoder trunk + RedNet streams
# -----------------------------------------------------------------------------
def init_bn_bottleneck(
    key, inplanes: int, planes: int, stride: int, downsample: bool
) -> Params:
    ks = jax.random.split(key, 4)
    p = {
        "conv1": F.init_conv2d(ks[0], inplanes, planes, 1, bias=False),
        "bn1": F.init_batchnorm(planes),
        "conv2": F.init_conv2d(ks[1], planes, planes, 3, bias=False),
        "bn2": F.init_batchnorm(planes),
        "conv3": F.init_conv2d(ks[2], planes, planes * 4, 1, bias=False),
        "bn3": F.init_batchnorm(planes * 4),
    }
    if downsample:
        p["downsample"] = {
            "0": F.init_conv2d(ks[3], inplanes, planes * 4, 1, bias=False),
            "1": F.init_batchnorm(planes * 4),
        }
    return p


def apply_bn_bottleneck(p: Params, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    out = F.relu(F.batchnorm(p["bn1"], F.conv2d(p["conv1"], x, 1, 0)))
    out = F.relu(F.batchnorm(p["bn2"], F.conv2d(p["conv2"], out, stride, 1)))
    out = F.batchnorm(p["bn3"], F.conv2d(p["conv3"], out, 1, 0))
    if "downsample" in p:
        identity = F.batchnorm(
            p["downsample"]["1"], F.conv2d(p["downsample"]["0"], x, stride, 0)
        )
    else:
        identity = x
    return F.relu(out + identity)


def init_bn_resnet50_trunk(key, in_channels: int = 3) -> Params:
    """conv1..layer4 of torchvision resnet50 (no avgpool/fc)."""
    keys = jax.random.split(key, 5)
    p: Params = {
        "conv1": F.init_conv2d(keys[0], in_channels, 64, 7, bias=False),
        "bn1": F.init_batchnorm(64),
    }
    inplanes = 64
    for si, (planes, blocks) in enumerate(
        zip([64, 128, 256, 512], RESNET50_LAYERS)
    ):
        stride = 1 if si == 0 else 2
        bkeys = jax.random.split(keys[si + 1], blocks)
        stage: Params = {}
        for bi in range(blocks):
            s = stride if bi == 0 else 1
            ds = bi == 0 and (s != 1 or inplanes != planes * 4)
            stage[str(bi)] = init_bn_bottleneck(bkeys[bi], inplanes, planes, s, ds)
            inplanes = planes * 4
        p[f"layer{si + 1}"] = stage
    return p


def apply_bn_resnet50_trunk(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """NHWC in -> (B, H/32, W/32, 2048). BatchNorm always in eval mode
    (running stats): both users freeze the trunk."""
    x = F.conv2d(p["conv1"], x, stride=2, padding=3)
    x = F.relu(F.batchnorm(p["bn1"], x))
    x = F.max_pool(x, 3, 2, 1)
    for si in range(4):
        stage = p[f"layer{si + 1}"]
        for bi in range(len(stage)):
            stride = (2 if si > 0 else 1) if bi == 0 else 1
            x = apply_bn_bottleneck(stage[str(bi)], x, stride)
    return x


RESNET18_LAYERS = [2, 2, 2, 2]


def init_bn_basicblock(
    key, inplanes: int, planes: int, stride: int, downsample: bool
) -> Params:
    """torchvision BasicBlock (resnet18/34): two 3x3 convs, expansion 1."""
    ks = jax.random.split(key, 3)
    p = {
        "conv1": F.init_conv2d(ks[0], inplanes, planes, 3, bias=False),
        "bn1": F.init_batchnorm(planes),
        "conv2": F.init_conv2d(ks[1], planes, planes, 3, bias=False),
        "bn2": F.init_batchnorm(planes),
    }
    if downsample:
        p["downsample"] = {
            "0": F.init_conv2d(ks[2], inplanes, planes, 1, bias=False),
            "1": F.init_batchnorm(planes),
        }
    return p


def apply_bn_basicblock(p: Params, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    out = F.relu(F.batchnorm(p["bn1"], F.conv2d(p["conv1"], x, stride, 1)))
    out = F.batchnorm(p["bn2"], F.conv2d(p["conv2"], out, 1, 1))
    if "downsample" in p:
        identity = F.batchnorm(
            p["downsample"]["1"], F.conv2d(p["downsample"]["0"], x, stride, 0)
        )
    else:
        identity = x
    return F.relu(out + identity)


def init_bn_resnet18_trunk(key, in_channels: int = 3) -> Params:
    """conv1..layer4 of torchvision resnet18 (no avgpool/fc)."""
    keys = jax.random.split(key, 5)
    p: Params = {
        "conv1": F.init_conv2d(keys[0], in_channels, 64, 7, bias=False),
        "bn1": F.init_batchnorm(64),
    }
    inplanes = 64
    for si, (planes, blocks) in enumerate(
        zip([64, 128, 256, 512], RESNET18_LAYERS)
    ):
        stride = 1 if si == 0 else 2
        bkeys = jax.random.split(keys[si + 1], blocks)
        stage: Params = {}
        for bi in range(blocks):
            s = stride if bi == 0 else 1
            ds = bi == 0 and (s != 1 or inplanes != planes)
            stage[str(bi)] = init_bn_basicblock(
                bkeys[bi], inplanes, planes, s, ds
            )
            inplanes = planes
        p[f"layer{si + 1}"] = stage
    return p


def apply_bn_resnet18_trunk(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """NHWC in -> (B, H/32, W/32, 512)."""
    x = F.conv2d(p["conv1"], x, stride=2, padding=3)
    x = F.relu(F.batchnorm(p["bn1"], x))
    x = F.max_pool(x, 3, 2, 1)
    for si in range(4):
        stage = p[f"layer{si + 1}"]
        for bi in range(len(stage)):
            stride = (2 if si > 0 else 1) if bi == 0 else 1
            x = apply_bn_basicblock(stage[str(bi)], x, stride)
    return x


# numpy, not jnp: module-level device constants poison the axon dispatch
# fast path when captured into executables (see ops/scatter.py NEG_INF)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def init_torchvision_resnet50_spatial(
    key, spatial_embedding_dim: int = 64
) -> Tuple[Params, Tuple[int, int, int]]:
    """TorchVisionResNet50 with spatial_output=True
    (resnet_encoders.py:145-168): trunk -> adaptive_avg_pool 4x4 ->
    + spatial embeddings. Output (2048 + 64, 4, 4)."""
    k1, k2 = jax.random.split(key)
    p = {
        "cnn": init_bn_resnet50_trunk(k1),
        "spatial_embeddings": F.init_embedding(k2, 16, spatial_embedding_dim),
    }
    return p, (2048 + spatial_embedding_dim, 4, 4)


def init_torchvision_resnet18_spatial(
    key, spatial_embedding_dim: int = 64
) -> Tuple[Params, Tuple[int, int, int]]:
    """TorchVisionResNet18, spatial_output=True
    (resnet_encoders.py:226-229): resnet18 trunk -> adaptive_avg_pool
    4x4 -> + spatial embeddings. Output (512 + 64, 4, 4)."""
    k1, k2 = jax.random.split(key)
    p = {
        "cnn": init_bn_resnet18_trunk(k1),
        "spatial_embeddings": F.init_embedding(k2, 16, spatial_embedding_dim),
    }
    return p, (512 + spatial_embedding_dim, 4, 4)


def _apply_torchvision_spatial(trunk_fn, p, rgb_nhwc_uint8, dtype):
    compute = dtype or jnp.float32
    cnn = F.cast_tree(p["cnn"], dtype) if dtype is not None else p["cnn"]
    x = rgb_nhwc_uint8.astype(compute) / 255.0
    x = trunk_fn(cnn, x)
    x = x.astype(jnp.float32)
    x = F.adaptive_avg_pool(x, (4, 4))  # (B, 4, 4, C)
    b = x.shape[0]
    x = x.transpose(0, 3, 1, 2)
    emb = p["spatial_embeddings"]["w"]  # (16, D)
    spatial = emb.T.reshape(1, -1, 4, 4)
    spatial = jnp.broadcast_to(spatial, (b, emb.shape[1], 4, 4))
    return jnp.concatenate([x, spatial], axis=1)


def apply_torchvision_resnet50_spatial(
    p: Params, rgb_nhwc_uint8: jnp.ndarray, dtype=None
) -> jnp.ndarray:
    """rgb uint8 (B, H, W, 3) -> (B, 2112, 4, 4) channel-first.

    The reference's TorchVisionResNet normalize() only scales /255
    (normalize_visual_inputs defaults False, resnet_encoders.py:183-192).
    """
    return _apply_torchvision_spatial(
        apply_bn_resnet50_trunk, p, rgb_nhwc_uint8, dtype
    )


def apply_torchvision_resnet18_spatial(
    p: Params, rgb_nhwc_uint8: jnp.ndarray, dtype=None
) -> jnp.ndarray:
    """rgb uint8 (B, H, W, 3) -> (B, 576, 4, 4) channel-first."""
    return _apply_torchvision_spatial(
        apply_bn_resnet18_trunk, p, rgb_nhwc_uint8, dtype
    )
