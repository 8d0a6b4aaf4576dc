"""Instruction encoder (reference:
ivlnce_baselines/models/encoders/instruction_encoder.py).

Embedding (GloVe-style pretrained, PAD=0) -> bi-LSTM -> per-token padded
features (B, 2H, T). ``final_state_only`` is forced False by both CMA nets
(map_cma_policy.py:117), so the per-token path is primary.
"""

from __future__ import annotations

import gzip
import json
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ivlnce_tpu.models import nn as F
from ivlnce_tpu.models import rnn as R

Params = Dict


def load_embeddings(embedding_file: str) -> np.ndarray:
    """Load pretrained embeddings (reference instruction_encoder.py:51-61):
    PAD index 0 = zeros, UNK index 1 = mean of all embeddings."""
    with gzip.open(embedding_file, "rt") as f:
        return np.asarray(json.load(f), dtype=np.float32)


def init_instruction_encoder(key, config) -> Params:
    k_emb, k_f, k_b = jax.random.split(key, 3)
    params: Params = {}
    if config.sensor_uuid == "instruction":
        if config.use_pretrained_embeddings and os.path.exists(
            config.embedding_file
        ):
            params["embedding"] = {
                "w": jnp.asarray(load_embeddings(config.embedding_file))
            }
        else:
            params["embedding"] = F.init_embedding(
                k_emb, config.vocab_size, config.embedding_size, padding_idx=0
            )
    assert config.rnn_type == "LSTM", (
        "reference trains with a bidirectional LSTM; GRU variant not used"
        " by any config"
    )
    params["lstm_fwd"] = R.init_lstm_cell(
        k_f, config.embedding_size, config.hidden_size
    )
    if config.bidirectional:
        params["lstm_bwd"] = R.init_lstm_cell(
            k_b, config.embedding_size, config.hidden_size
        )
    return params


def output_size(config) -> int:
    return config.hidden_size * (1 + int(config.bidirectional))


def apply_instruction_encoder(
    params: Params, config, observations: Dict[str, jnp.ndarray]
) -> jnp.ndarray:
    """Returns per-token features (B, 2H, T) with padded positions zeroed
    (the CMA text mask detects padding via all-zero channels,
    map_cma_policy.py:322)."""
    if "instruction_features" in observations:
        # per-episode cached encoding (the instruction is constant within
        # an episode; trainers re-encode only at episode boundaries and
        # feed the features through the obs dict, so the per-step fused
        # executable contains no token scan at all)
        return observations["instruction_features"]
    if config.sensor_uuid == "instruction":
        instruction = observations["instruction"].astype(jnp.int32)
        lengths = jnp.sum((instruction != 0).astype(jnp.int32), axis=1)
        embedded = F.embedding(params["embedding"], instruction)  # (B, T, E)
    else:
        embedded = observations["rxr_instruction"]
        lengths = jnp.sum(
            (jnp.sum((embedded != 0).astype(jnp.int32), axis=2) != 0).astype(
                jnp.int32
            ),
            axis=1,
        )

    outputs, final = R.bi_lstm_padded(
        params["lstm_fwd"],
        params.get("lstm_bwd", params["lstm_fwd"]),
        embedded,
        lengths,
    )
    if config.final_state_only:
        return final
    return outputs.transpose(0, 2, 1)  # (B, 2H, T)
