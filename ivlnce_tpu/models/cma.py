"""Cross-modal attention policy networks.

MapCMANet (reference: ivlnce_baselines/models/map_cma_policy.py:103-368)
and LatentCMANet (latent_cma_policy.py:196-497) as pure functions over
parameter pytrees. RNN state is (B, L, H) where L counts recurrent slots:

- MapCMA: L=2 (two GRUs)
- LatentCMA: L=2, +1 tour-memory slot when tour_memory_variant

Mask semantics (identical to the reference forward signatures):
- action_masks gate the prev-action embedding: index 0 when mask==0;
- episode_masks reset both GRU hidden states;
- tour_masks reset only the tour-memory slot (LatentCMA variant).

TPU-first structure: each net is split into an ``encode`` stage (instruction
bi-LSTM + CNN encoders + KV projections — batched over T*N on the MXU) and
a ``recurrent step`` (two GRU cells + state-conditioned attention — scanned
over T). Single-step eval is the same step with T=1, so train and eval
share one code path. The reference instead re-runs its whole forward per
step inside a Python loop for the unrolled variants
(latent_cma_policy.py:150-167).

The progress-monitor auxiliary loss is computed by the trainer from the
returned features via ``progress_monitor_loss`` below (the reference uses
a global AuxLosses singleton, common/aux_losses.py; our functional
replacement lives in trainers/base_trainer.py make_train_step).
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ivlnce_tpu.models import instruction_encoder as IE
from ivlnce_tpu.models import map_encoder as ME
from ivlnce_tpu.models import nn as F
from ivlnce_tpu.models import resnet as RN
from ivlnce_tpu.models import rnn as R

Params = Dict


def _compute_dtype(cfg):
    """TPU.compute_dtype threaded onto the model config by the policies
    (policy.py); None = f32 parity path."""
    name = getattr(cfg, "compute_dtype", "float32")
    return jnp.bfloat16 if name == "bfloat16" else None


def _attn(q, k, v, scale, mask=None):
    """Reference _attn (map_cma_policy.py:266-274): q (B, C), k/v
    (B, C, I); mask True marks invalid positions."""
    logits = jnp.einsum(
        "nc,nci->ni", q, k, precision=jax.lax.Precision.HIGHEST
    )
    if mask is not None:
        logits = logits - mask.astype(jnp.float32) * 1e8
    attn = jax.nn.softmax(logits * scale, axis=1)
    return jnp.einsum(
        "ni,nci->nc", attn, v, precision=jax.lax.Precision.HIGHEST
    )


def _prev_action_embed(params, prev_actions, action_masks):
    """((a + 1) * mask) as embedding index (map_cma_policy.py:297-299)."""
    prev = prev_actions.reshape(-1).astype(jnp.float32)
    mask = action_masks.reshape(-1).astype(jnp.float32)
    idx = ((prev + 1) * mask).astype(jnp.int32)
    return F.embedding(params, idx)


class CMAFeatures(NamedTuple):
    """Per-frame encoder outputs consumed by the recurrent step. All
    shaped (N, ...) — for sequences, reshape to (T, N, ...) before scan."""

    txt: jnp.ndarray  # (N, C_txt, T_tokens)
    text_mask: jnp.ndarray  # (N, T_tokens)
    vis1_in: jnp.ndarray  # (N, d_out) first modality linear (depth | rgb)
    vis2_in: jnp.ndarray  # (N, m_out) second modality linear (map | depth)
    vis1_k: jnp.ndarray  # (N, half, I)
    vis1_v: jnp.ndarray  # (N, out, I)
    vis2_k: jnp.ndarray
    vis2_v: jnp.ndarray
    prev_a: jnp.ndarray  # (N, 32)


# -----------------------------------------------------------------------------
# MapCMA
# -----------------------------------------------------------------------------
def init_map_cma(key, model_config, depth_hw: int, map_hw: int) -> Params:
    """depth_hw: depth sensor height==width (256); map_hw: map cells (64)."""
    cfg = model_config
    hidden = cfg.STATE_ENCODER.hidden_size
    half = hidden // 2
    ks = jax.random.split(key, 16)

    map_out, map_shape = ME.init_map_encoder(
        ks[0],
        (map_hw, map_hw),
        cfg.SEMANTIC_MAP_ENCODER.num_semantic_classes,
        cfg.SEMANTIC_MAP_ENCODER.channels,
        cfg.SEMANTIC_MAP_ENCODER.last_ch_mult,
    )
    depth_params, depth_shape = RN.init_vln_depth_encoder(ks[1], depth_hw // 2)
    instr = IE.init_instruction_encoder(ks[2], cfg.INSTRUCTION_ENCODER)
    instr_out = IE.output_size(cfg.INSTRUCTION_ENCODER)

    d_out = cfg.DEPTH_ENCODER.output_size
    m_out = cfg.SEMANTIC_MAP_ENCODER.output_size
    p: Params = {
        "map_encoder": map_out,
        "depth_encoder": depth_params,
        "instruction_encoder": instr,
        "prev_action_embedding": F.init_embedding(ks[3], 4 + 1, 32),
        "depth_linear": {
            "1": F.init_linear(
                ks[4], int(jnp.prod(jnp.array(depth_shape))), d_out
            )
        },
        "map_linear": {
            "1": F.init_linear(ks[5], int(jnp.prod(jnp.array(map_shape))), m_out)
        },
        "state_encoder": R.init_gru_cell(ks[6], d_out + m_out + 32, hidden),
        "dep_kv": F.init_linear(ks[7], depth_shape[0], half + d_out),
        "map_kv": F.init_linear(ks[8], map_shape[0], half + m_out),
        "state_q": F.init_linear(ks[9], hidden, half),
        "text_k": F.init_linear(ks[10], instr_out, half),
        "text_q": F.init_linear(ks[11], instr_out, half),
        "second_state_compress": {
            "0": F.init_linear(
                ks[12], hidden + d_out + instr_out + m_out + 32, hidden
            )
        },
        "second_state_encoder": R.init_gru_cell(ks[13], hidden, hidden),
        "progress_monitor": F.init_linear(ks[14], hidden, 1),
    }
    if cfg.PROGRESS_MONITOR.use:
        p["progress_monitor"]["w"] = F.kaiming_normal_init(
            ks[15], (1, hidden), hidden, nonlinearity_gain=5.0 / 3
        )
        p["progress_monitor"]["b"] = jnp.zeros((1,), jnp.float32)
    return p


def map_cma_encode(
    params: Params,
    model_config,
    observations: Dict[str, jnp.ndarray],
    prev_actions: jnp.ndarray,
    action_masks: jnp.ndarray,
    training: bool = False,
) -> CMAFeatures:
    cfg = model_config
    hidden = cfg.STATE_ENCODER.hidden_size
    half = hidden // 2

    txt = IE.apply_instruction_encoder(
        params["instruction_encoder"], cfg.INSTRUCTION_ENCODER, observations
    )  # (N, C_txt, T_tokens)

    dtype = _compute_dtype(cfg)
    if "depth_features" in observations:
        dep = observations["depth_features"]
    else:
        dep = RN.apply_vln_depth_encoder(
            params["depth_encoder"], observations["depth"], dtype=dtype
        )  # (N, C, h, w)
    dep = dep.reshape(dep.shape[0], dep.shape[1], -1)

    map_train = training and cfg.SEMANTIC_MAP_ENCODER.trainable
    map_feat = ME.apply_map_encoder(
        params["map_encoder"],
        observations["occupancy_map"],
        observations["semantic_map"],
        cfg.SEMANTIC_MAP_ENCODER.num_semantic_classes,
        training=map_train,
        # keep the trainable map encoder in f32 during training (master
        # weights stay f32; only the frozen-eval path drops precision)
        dtype=None if map_train else dtype,
    )
    map_feat = map_feat.reshape(map_feat.shape[0], map_feat.shape[1], -1)

    prev_a = _prev_action_embed(
        params["prev_action_embedding"], prev_actions, action_masks.reshape(-1)
    )

    if cfg.ablate_instruction:
        txt = txt * 0
    if cfg.ablate_depth:
        dep = dep * 0
    if cfg.ablate_map:
        map_feat = map_feat * 0

    dep_in = F.relu(
        F.linear(params["depth_linear"]["1"], dep.reshape(dep.shape[0], -1))
    )
    map_in = F.relu(
        F.linear(
            params["map_linear"]["1"], map_feat.reshape(map_feat.shape[0], -1)
        )
    )

    dep_kv = F.conv1d(params["dep_kv"], dep)
    map_kv = F.conv1d(params["map_kv"], map_feat)

    return CMAFeatures(
        txt=txt,
        text_mask=jnp.all(txt == 0.0, axis=1),
        vis1_in=dep_in,
        vis2_in=map_in,
        vis1_k=dep_kv[:, :half],
        vis1_v=dep_kv[:, half:],
        vis2_k=map_kv[:, :half],
        vis2_v=map_kv[:, half:],
        prev_a=prev_a,
    )


def map_cma_step(
    params: Params,
    model_config,
    feats: CMAFeatures,
    rnn_states: jnp.ndarray,  # (N, 2, hidden)
    episode_masks: jnp.ndarray,  # (N,)
    tour_masks: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The recurrent + attention half (map_cma_policy.py:311-353)."""
    cfg = model_config
    hidden = cfg.STATE_ENCODER.hidden_size
    half = hidden // 2
    scale = 1.0 / math.sqrt(half)

    state_in = jnp.concatenate(
        [feats.vis1_in, feats.vis2_in, feats.prev_a], axis=1
    )
    h1 = R.masked_gru_step(
        params["state_encoder"], state_in, rnn_states[:, 0], episode_masks
    )
    state = h1

    text_state_q = F.linear(params["state_q"], state)
    text_state_k = F.conv1d(params["text_k"], feats.txt)
    text_embedding = _attn(
        text_state_q, text_state_k, feats.txt, scale, feats.text_mask
    )

    text_q = F.linear(params["text_q"], text_embedding)
    v1_att = _attn(text_q, feats.vis1_k, feats.vis1_v, scale)
    v2_att = _attn(text_q, feats.vis2_k, feats.vis2_v, scale)

    x = jnp.concatenate(
        [state, text_embedding, v1_att, v2_att, feats.prev_a], axis=1
    )
    x = F.relu(F.linear(params["second_state_compress"]["0"], x))
    h2 = R.masked_gru_step(
        params["second_state_encoder"], x, rnn_states[:, 1], episode_masks
    )
    return h2, jnp.stack([h1, h2], axis=1)


def apply_map_cma(
    params: Params,
    model_config,
    observations: Dict[str, jnp.ndarray],
    rnn_states: jnp.ndarray,
    prev_actions: jnp.ndarray,
    action_masks: jnp.ndarray,
    episode_masks: Optional[jnp.ndarray] = None,
    tour_masks: Optional[jnp.ndarray] = None,
    training: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-step forward: (features (N, hidden), rnn_states_out)."""
    action_masks = action_masks.reshape(-1)
    if episode_masks is None:
        episode_masks = action_masks
    feats = map_cma_encode(
        params, model_config, observations, prev_actions, action_masks,
        training,
    )
    return map_cma_step(
        params, model_config, feats, rnn_states, episode_masks.reshape(-1)
    )


def map_cma_num_recurrent_layers(model_config) -> int:
    return 2


# -----------------------------------------------------------------------------
# LatentCMA
# -----------------------------------------------------------------------------
def init_latent_cma(key, model_config, depth_hw: int) -> Params:
    cfg = model_config
    hidden = cfg.STATE_ENCODER.hidden_size
    half = hidden // 2
    ks = jax.random.split(key, 16)

    depth_params, depth_shape = RN.init_vln_depth_encoder(ks[0], depth_hw // 2)
    # RGB_ENCODER.cnn_type selects the torchvision trunk (the reference
    # ships both TorchVisionResNet50 and TorchVisionResNet18,
    # resnet_encoders.py:118-229)
    if cfg.RGB_ENCODER.cnn_type == "TorchVisionResNet18":
        rgb_params, rgb_shape = RN.init_torchvision_resnet18_spatial(ks[1])
    else:
        rgb_params, rgb_shape = RN.init_torchvision_resnet50_spatial(ks[1])
    instr = IE.init_instruction_encoder(ks[2], cfg.INSTRUCTION_ENCODER)
    instr_out = IE.output_size(cfg.INSTRUCTION_ENCODER)

    d_out = cfg.DEPTH_ENCODER.output_size
    r_out = cfg.RGB_ENCODER.output_size
    rnn_in = d_out + r_out + 32
    if cfg.tour_memory_variant:
        rnn_in += hidden

    p: Params = {
        "depth_encoder": depth_params,
        "rgb_encoder": rgb_params,
        "instruction_encoder": instr,
        "prev_action_embedding": F.init_embedding(ks[3], 4 + 1, 32),
        "rgb_linear": {"2": F.init_linear(ks[4], rgb_shape[0], r_out)},
        "depth_linear": {
            "1": F.init_linear(
                ks[5], int(jnp.prod(jnp.array(depth_shape))), d_out
            )
        },
        "state_encoder": R.init_gru_cell(ks[6], rnn_in, hidden),
        "rgb_kv": F.init_linear(ks[7], rgb_shape[0], half + r_out),
        "depth_kv": F.init_linear(ks[8], depth_shape[0], half + d_out),
        "state_q": F.init_linear(ks[9], hidden, half),
        "text_k": F.init_linear(ks[10], instr_out, half),
        "text_q": F.init_linear(ks[11], instr_out, half),
        "second_state_compress": {
            "0": F.init_linear(
                ks[12], hidden + r_out + d_out + instr_out + 32, hidden
            )
        },
        "second_state_encoder": R.init_gru_cell(ks[13], hidden, hidden),
        "progress_monitor": F.init_linear(ks[14], hidden, 1),
    }
    if cfg.memory_at_end:
        p["out_layer"] = {"0": F.init_linear(ks[15], hidden * 2, hidden)}
    return p


def latent_cma_encode(
    params: Params,
    model_config,
    observations: Dict[str, jnp.ndarray],
    prev_actions: jnp.ndarray,
    action_masks: jnp.ndarray,
    training: bool = False,
) -> CMAFeatures:
    cfg = model_config
    hidden = cfg.STATE_ENCODER.hidden_size
    half = hidden // 2

    txt = IE.apply_instruction_encoder(
        params["instruction_encoder"], cfg.INSTRUCTION_ENCODER, observations
    )

    dtype = _compute_dtype(cfg)
    if "depth_features" in observations:
        dep = observations["depth_features"]
    else:
        dep = RN.apply_vln_depth_encoder(
            params["depth_encoder"], observations["depth"], dtype=dtype
        )
    dep = dep.reshape(dep.shape[0], dep.shape[1], -1)

    if "rgb_features" in observations:
        rgb = observations["rgb_features"]
    elif cfg.RGB_ENCODER.cnn_type == "TorchVisionResNet18":
        rgb = RN.apply_torchvision_resnet18_spatial(
            params["rgb_encoder"], observations["rgb"], dtype=dtype
        )
    else:
        rgb = RN.apply_torchvision_resnet50_spatial(
            params["rgb_encoder"], observations["rgb"], dtype=dtype
        )
    rgb = rgb.reshape(rgb.shape[0], rgb.shape[1], -1)

    prev_a = _prev_action_embed(
        params["prev_action_embedding"], prev_actions, action_masks.reshape(-1)
    )

    if cfg.ablate_instruction:
        txt = txt * 0
    if cfg.ablate_depth:
        dep = dep * 0
    if cfg.ablate_rgb:
        rgb = rgb * 0

    # rgb_linear: AdaptiveAvgPool1d(1) over spatial -> linear -> ReLU
    rgb_in = F.relu(F.linear(params["rgb_linear"]["2"], jnp.mean(rgb, axis=2)))
    dep_in = F.relu(
        F.linear(params["depth_linear"]["1"], dep.reshape(dep.shape[0], -1))
    )

    rgb_kv = F.conv1d(params["rgb_kv"], rgb)
    dep_kv = F.conv1d(params["depth_kv"], dep)

    return CMAFeatures(
        txt=txt,
        text_mask=jnp.all(txt == 0.0, axis=1),
        vis1_in=rgb_in,
        vis2_in=dep_in,
        vis1_k=rgb_kv[:, :half],
        vis1_v=rgb_kv[:, half:],
        vis2_k=dep_kv[:, :half],
        vis2_v=dep_kv[:, half:],
        prev_a=prev_a,
    )


def latent_cma_step(
    params: Params,
    model_config,
    feats: CMAFeatures,
    rnn_states: jnp.ndarray,  # (N, L, hidden)
    episode_masks: jnp.ndarray,  # (N,)
    tour_masks: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Recurrent half with optional cross-episode memory slot
    (latent_cma_policy.py:375-497)."""
    cfg = model_config
    hidden = cfg.STATE_ENCODER.hidden_size
    half = hidden // 2
    scale = 1.0 / math.sqrt(half)

    if cfg.disable_tour_memory:
        tour_masks = None
    if tour_masks is None:
        tour_masks = episode_masks

    memory = None
    if cfg.tour_memory_variant:
        memory = rnn_states[:, 2] * tour_masks.reshape(-1, 1)

    state_inputs = [feats.vis1_in, feats.vis2_in, feats.prev_a]
    if cfg.tour_memory_variant:
        state_inputs.append(memory)
    state_in = jnp.concatenate(state_inputs, axis=1)

    h1 = R.masked_gru_step(
        params["state_encoder"], state_in, rnn_states[:, 0], episode_masks
    )
    state = h1

    # cross-episode memory: elementwise max with the new h1
    # (latent_cma_policy.py:434-439, under no_grad in the reference)
    new_memory = None
    if cfg.tour_memory_variant:
        new_memory = jax.lax.stop_gradient(jnp.maximum(memory, h1))

    text_state_q = F.linear(params["state_q"], state)
    text_state_k = F.conv1d(params["text_k"], feats.txt)
    text_embedding = _attn(
        text_state_q, text_state_k, feats.txt, scale, feats.text_mask
    )

    text_q = F.linear(params["text_q"], text_embedding)
    v1_att = _attn(text_q, feats.vis1_k, feats.vis1_v, scale)
    v2_att = _attn(text_q, feats.vis2_k, feats.vis2_v, scale)

    x = jnp.concatenate(
        [state, text_embedding, v1_att, v2_att, feats.prev_a], axis=1
    )
    x = F.relu(F.linear(params["second_state_compress"]["0"], x))
    h2 = R.masked_gru_step(
        params["second_state_encoder"], x, rnn_states[:, 1], episode_masks
    )
    x = h2

    if cfg.memory_at_end:
        # reads the masked PRE-max memory (latent_cma_policy.py:479-482)
        x = F.relu(
            F.linear(
                params["out_layer"]["0"], jnp.concatenate([x, memory], axis=1)
            )
        )

    slots = [h1, h2]
    if cfg.tour_memory_variant:
        slots.append(new_memory)
    return x, jnp.stack(slots, axis=1)


def apply_latent_cma(
    params: Params,
    model_config,
    observations: Dict[str, jnp.ndarray],
    rnn_states: jnp.ndarray,
    prev_actions: jnp.ndarray,
    action_masks: jnp.ndarray,
    episode_masks: Optional[jnp.ndarray] = None,
    tour_masks: Optional[jnp.ndarray] = None,
    training: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    action_masks = action_masks.reshape(-1)
    if episode_masks is None:
        episode_masks = action_masks
    feats = latent_cma_encode(
        params, model_config, observations, prev_actions, action_masks,
        training,
    )
    return latent_cma_step(
        params,
        model_config,
        feats,
        rnn_states,
        episode_masks.reshape(-1),
        None if tour_masks is None else tour_masks.reshape(-1),
    )


def latent_cma_num_recurrent_layers(model_config) -> int:
    return 2 + int(model_config.tour_memory_variant)


def progress_monitor_loss(
    params: Params, features: jnp.ndarray, progress: jnp.ndarray
) -> jnp.ndarray:
    """Per-sample MSE of tanh(progress head) vs GT progress
    (map_cma_policy.py:355-366). Reduced by the trainer with inflection
    weights / masks."""
    progress_hat = jnp.tanh(F.linear(params["progress_monitor"], features))
    return (progress_hat[:, 0] - progress.reshape(-1)) ** 2
