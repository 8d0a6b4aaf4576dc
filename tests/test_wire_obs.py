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
        def __init__(self):  # skip heavy Mapper init, but give the
            # property its REAL attribute surface (it reads these)
            self.known_maps = False
            self.predicted_semantics = False
            self.scene_centers = {}

    class FakePred(PredictedSemanticsIterativeMapper):
        def __init__(self):
            self.known_maps = False
            self.predicted_semantics = True
            self.scene_centers = {}

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


def test_wire_keys_buggy_property_fails_loud():
    """An exception raised INSIDE device_obs_keys must propagate, not
    silently disable the upload filter (VERDICT r4 weak #3: a
    getattr-default swallowed AttributeError and re-uploaded every
    frame — a performance cliff with no symptom)."""

    class DeclaringPolicy:
        device_obs_keys = frozenset({"depth"})

    class BuggyTransform:
        @property
        def device_obs_keys(self):
            raise AttributeError("missing internal attr")

    with pytest.raises(AttributeError, match="missing internal attr"):
        batching.wire_obs_keys(DeclaringPolicy(), BuggyTransform())
    with pytest.raises(AttributeError):
        batching.wire_obs_keys(BuggyTransform(), None)


def test_uint16_wire_depth_through_fused_step_matches_float():
    """The full trainer-style fused step (device mapper + policy act) fed
    uint16 wire depth via decode_wire_obs must produce the same actions
    as the float32 path (quantization is 0.08 mm at the 10 m depth range
    vs 50 mm voxels)."""
    import jax
    import jax.numpy as jnp

    from ivlnce_tpu.config import get_config
    from ivlnce_tpu.mapping.obs_transforms import GTSemanticsIterativeMapper
    from ivlnce_tpu.models.policy import MapCMAPolicy

    B, DHW, MHW = 2, 64, 64
    config = get_config().clone()
    config.defrost()
    config.MODEL.policy_name = "MapCMAPolicy"
    config.MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings = False
    config.MODEL.INSTRUCTION_ENCODER.vocab_size = 32
    config.TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT = DHW
    config.TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH = DHW
    config.TPU.world_grid_cells = 512
    config.freeze()
    policy = MapCMAPolicy.from_config(config, {"depth_hw": DHW, "map_hw": MHW})
    params = policy.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(1)
    obs = {
        "depth": rng.random((B, DHW, DHW, 1), np.float32) * 0.5 + 0.05,
        "semantic12": rng.integers(0, 14, (B, DHW, DHW)).astype(np.uint8),
        "world_robot_pose": rng.normal(size=(B, 3)).astype(np.float32),
        "world_robot_orientation": np.stack(
            [np.zeros(B), rng.random(B) * 6.28], 1
        ).astype(np.float32),
        "instruction": rng.integers(1, 30, (B, 12)).astype(np.int32),
    }
    masks = np.ones((B, 1), np.float32)

    transform = GTSemanticsIterativeMapper.from_config(config)
    transform.host_prepare(obs, masks.reshape(-1))
    device_step = transform.make_device_step()
    state0 = transform.state

    @jax.jit
    def fused(params, state, obs, reset_masks, rnn, prev, masks):
        obs = batching.decode_wire_obs(obs)
        state, occ, sem = device_step(state, obs, reset_masks, {})
        pobs = dict(obs)
        pobs["occupancy_map"] = occ
        pobs["semantic_map"] = sem
        return policy.act(params, pobs, rnn, prev, masks)

    rnn = policy.initial_rnn_states(B)
    prev = jnp.zeros((B, 1), jnp.int32)
    outs = {}
    for wire in (False, True):
        dobs = batching.encode_wire_obs(dict(obs), depth_uint16=wire)
        dobs = {k: jnp.asarray(v) for k, v in dobs.items()}
        assert dobs["depth"].dtype == (jnp.uint16 if wire else jnp.float32)
        outs[wire] = fused(
            params, state0, dobs, jnp.asarray(masks.reshape(-1)),
            rnn, prev, jnp.asarray(masks),
        )
    np.testing.assert_array_equal(
        np.asarray(outs[False].actions), np.asarray(outs[True].actions)
    )
    np.testing.assert_allclose(
        np.asarray(outs[False].logits), np.asarray(outs[True].logits),
        atol=5e-3,
    )
