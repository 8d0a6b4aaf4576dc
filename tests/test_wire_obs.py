"""Host->device wire format (utils/batching.py): upload filtering and
uint16 depth quantization. The live loops are upload-bandwidth-bound on
constrained transports (BASELINE.md r3), so only keys the act executable
reads cross the wire and normalized depth travels as uint16."""

import numpy as np
import pytest

from ivlnce_tpu.utils import batching


def test_depth_encode_decode_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    depth = rng.random((3, 16, 16, 1), dtype=np.float32)
    enc = batching.encode_wire_obs({"depth": depth})
    assert enc["depth"].dtype == np.uint16
    import jax.numpy as jnp

    dec = batching.decode_wire_obs({"depth": jnp.asarray(enc["depth"])})
    err = np.abs(np.asarray(dec["depth"]) - depth).max()
    assert err <= 1.0 / 65535.0  # half-ulp rounding
    assert np.asarray(dec["depth"]).dtype == np.float32


def test_encode_disabled_and_float_passthrough():
    depth = np.zeros((2, 4, 4, 1), np.float32)
    enc = batching.encode_wire_obs({"depth": depth}, depth_uint16=False)
    assert enc["depth"].dtype == np.float32
    import jax.numpy as jnp

    dec = batching.decode_wire_obs({"depth": jnp.asarray(depth)})
    assert dec["depth"].dtype == jnp.float32  # untouched


def test_out_of_range_depth_clipped_not_wrapped():
    depth = np.array([[-0.5, 1.5]], np.float32)
    enc = batching.encode_wire_obs({"depth": depth})
    assert enc["depth"][0, 0] == 0
    assert enc["depth"][0, 1] == 65535


def test_wire_keys_map_cma_with_gt_mapper_excludes_rgb():
    from ivlnce_tpu.mapping.obs_transforms import (
        GTSemanticsIterativeMapper,
        PredictedSemanticsIterativeMapper,
    )
    from ivlnce_tpu.models.policy import LatentCMAPolicy, MapCMAPolicy

    class FakeMapper(GTSemanticsIterativeMapper):
        def __init__(self):  # skip heavy Mapper init
            pass

    class FakePred(PredictedSemanticsIterativeMapper):
        def __init__(self):
            pass

    class FakePolicy(MapCMAPolicy):
        def __init__(self):
            pass

    class FakeLatent(LatentCMAPolicy):
        def __init__(self):
            pass

    keys = batching.wire_obs_keys(FakePolicy(), FakeMapper())
    assert "rgb" not in keys
    assert {"depth", "semantic12", "world_robot_pose",
            "world_robot_orientation", "instruction"} <= keys

    keys = batching.wire_obs_keys(FakePolicy(), FakePred())
    assert "rgb" in keys and "semantic12" not in keys

    keys = batching.wire_obs_keys(FakeLatent(), None)
    assert {"depth", "rgb"} <= keys


def test_wire_keys_unknown_policy_uploads_everything():
    class Mystery:
        pass

    assert batching.wire_obs_keys(Mystery(), None) is None
