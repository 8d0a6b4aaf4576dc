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


# -- wire format for the host->device sensor upload ---------------------------
# The live-act loops are upload-bandwidth-bound on constrained transports
# (BASELINE.md: ~11 MB/s through the axon tunnel; a B=64 step uploads
# ~31 MB raw). Two reductions, both lossless for the task:
#   * only keys the act executable actually reads cross the wire
#     (policy.device_obs_keys | transform.device_obs_keys — e.g. MapCMA
#     with GT semantics never reads rgb: 9.6 MB/step at B=64);
#   * normalized [0,1] float32 depth travels as uint16 and is expanded
#     on device (<= 7.7e-6 quantization = 0.08 mm at the 10 m depth
#     range, vs the mapper's 0.05 m voxels).

DEPTH_WIRE_SCALE = 65535.0


def encode_wire_obs(dobs: Dict[str, Any], depth_uint16: bool = True) -> Dict:
    """HOST side: shrink arrays before they cross into jit args."""
    if not depth_uint16:
        return dobs
    d = dobs.get("depth")
    if d is not None and getattr(d, "dtype", None) == np.float32:
        dobs = dict(dobs)
        dobs["depth"] = (
            np.clip(d, 0.0, 1.0) * DEPTH_WIRE_SCALE + 0.5
        ).astype(np.uint16)
    return dobs


def decode_wire_obs(obs: Dict[str, Any]) -> Dict:
    """DEVICE side (inside jit): expand wire dtypes back. Must mirror
    encode_wire_obs; a float32 depth passes through untouched so callers
    that never encode (tests, direct policy use) are unaffected."""
    import jax.numpy as jnp

    d = obs.get("depth")
    if d is not None and d.dtype == jnp.uint16:
        obs = dict(obs)
        obs["depth"] = d.astype(jnp.float32) * (1.0 / DEPTH_WIRE_SCALE)
    return obs


def _declared_obs_keys(obj) -> Optional[Set[str]]:
    """``obj.device_obs_keys`` if its CLASS declares it, else None.

    The declaration check is on the class so that an exception raised
    *inside* the property propagates loudly: a buggy property must not
    be mistaken for "declares nothing" — ``getattr(obj, ..., None)``
    would silently disable the wire-upload filter, re-uploading every
    frame (a performance cliff, VERDICT r4 weak #3)."""
    if not hasattr(type(obj), "device_obs_keys"):
        return None
    keys = obj.device_obs_keys  # exceptions propagate
    return None if keys is None else set(keys)


def wire_obs_keys(policy, transform) -> Optional[Set[str]]:
    """Union of the obs keys the fused act executable reads, or None when
    either side doesn't declare its needs (None = upload everything, the
    reference's deliberate behavior, common/utils.py:95-135).
    Instruction keys always pass: the per-episode cache consumes and
    strips them (base_trainer._cache_instruction_features)."""
    pk = _declared_obs_keys(policy)
    if pk is None:
        return None
    keys = set(pk)
    if transform is not None:
        tk = _declared_obs_keys(transform)
        if tk is None:
            return None
        keys |= tk
    keys |= {"instruction", "rxr_instruction"}
    return keys
