"""Observation batching utilities (reference:
ivlnce_baselines/common/utils.py:12-146), producing numpy arrays ready for
a single host->device put per step (the TPU step functions take the whole
batch dict)."""

from __future__ import annotations

from collections import defaultdict
from typing import Any, Dict, List, Optional, Set

import numpy as np


def extract_instruction_tokens(
    observations: List[Dict],
    instruction_sensor_uuid: str = "instruction",
    tokens_uuid: str = "tokens",
    max_length: Optional[int] = 200,
) -> List[Dict]:
    """Replace instruction dicts by fixed-length token arrays
    (reference utils.py:12-35 + static-shape padding for XLA)."""
    if (
        not observations
        or instruction_sensor_uuid not in observations[0]
        or instruction_sensor_uuid == "pointgoal_with_gps_compass"
    ):
        return observations
    for obs in observations:
        entry = obs.get(instruction_sensor_uuid)
        if isinstance(entry, dict) and tokens_uuid in entry:
            tokens = np.asarray(entry[tokens_uuid], dtype=np.int64)
            if max_length is not None:
                out = np.zeros((max_length,), np.int64)
                n = min(len(tokens), max_length)
                out[:n] = tokens[:n]
                tokens = out
            obs[instruction_sensor_uuid] = tokens
    return observations


def batch_obs(
    observations: List[Dict],
    ignore_keys: Optional[Set[str]] = None,
) -> Dict[str, Any]:
    """list of per-lane obs dicts -> dict of stacked numpy arrays; string
    entries (env_name) stay python lists (reference utils.py:57-92)."""
    if ignore_keys is None:
        ignore_keys = {"env_name"}
    batch: Dict[str, List] = defaultdict(list)
    for obs in observations:
        for sensor, value in obs.items():
            if isinstance(value, np.ndarray) and value.dtype == np.uint32:
                value = value.astype(np.int32)
            batch[sensor].append(value)

    out: Dict[str, Any] = {}
    for sensor, values in batch.items():
        if sensor in ignore_keys or isinstance(values[0], str):
            out[sensor] = values
        else:
            out[sensor] = np.stack([np.asarray(v) for v in values], axis=0)
    return out


def add_batched_data_to_observations(
    observations: List[Dict], batched_data, key: str
) -> List[Dict]:
    """Inject per-lane rows of a batched array into the per-env obs dicts
    (reference utils.py:138-146)."""
    if batched_data is not None:
        for i in range(len(observations)):
            observations[i][key] = np.asarray(batched_data[i])
    return observations
