"""Multi-chip sharding CI (VERDICT r2 item 4).

The only executable proof of the mesh path used to be the driver's
``dryrun_multichip``; these tests run the same assertions in-repo on the
8-device virtual CPU platform (tests/conftest.py) so a sharding
regression fails pytest before the driver sees it.

Covers parallel/mesh.py (make_mesh, param_shardings, batch_sharding) and
parallel/train.py (sharded_train_step loss parity vs the single-device
step), plus the lane-sharded fused mapper+policy act path.
"""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from ivlnce_tpu.parallel import make_mesh, param_shardings
from ivlnce_tpu.parallel.mesh import batch_sharding, replicated


def test_make_mesh_shapes():
    mesh = make_mesh(8, model_parallel=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    assert make_mesh(8).shape["data"] == 8
    with pytest.raises(ValueError, match="divisible"):
        make_mesh(8, model_parallel=3)


def test_param_shardings_rules():
    mesh = make_mesh(8, model_parallel=2)
    params = {
        "big_linear": np.zeros((512, 256), np.float32),  # out axis 0
        "conv_hwio": np.zeros((7, 7, 14, 64), np.float32),  # out axis -1
        "small": np.zeros((4, 4), np.float32),  # under min size
        "bias": np.zeros((512,), np.float32),  # 1D always replicated
        "odd_out": np.zeros((513, 256), np.float32),  # 513 % 2 != 0
    }
    sh = param_shardings(params, mesh)
    assert sh["big_linear"].spec == P("model", None)
    assert sh["conv_hwio"].spec == P(None, None, None, "model")
    assert sh["small"].spec == P()
    assert sh["bias"].spec == P()
    assert sh["odd_out"].spec == P()

    # batch/replicated helpers
    assert batch_sharding(mesh, 0, 3).spec == P("data", None, None)
    assert replicated(mesh).spec == P()

    # placing an array with these shardings must not error and must
    # actually distribute shards over the model axis
    x = jax.device_put(params["big_linear"], sh["big_linear"])
    assert len(x.sharding.device_set) == 8
    assert x.addressable_shards[0].data.shape == (256, 256)


def test_sharded_train_step_parity_and_fused_act():
    """Full IL train step over the (data=4, model=2) mesh: loss must match
    the single-device step (catches silently wrong shardings), and the
    lane-sharded fused mapper+policy act must execute.

    Delegates to __graft_entry__.dryrun_multichip — the exact code the
    driver runs — which raises on loss-parity or shape failures.
    """
    import __graft_entry__ as g

    assert len(jax.devices()) >= 8  # conftest forces the virtual platform
    g.dryrun_multichip(8)


def test_trainer_picks_sharded_update_and_matches_single_device(tmp_path):
    """TPU.data_parallel_devices routes BaseVLNCETrainer._update_agent
    through parallel.sharded_train_step; the resulting loss must match
    the single-device update bit-for-bit-ish (<= 1e-4 rel)."""
    import optax

    from ivlnce_tpu.config import get_config
    from ivlnce_tpu.models.policy import MapCMAPolicy
    from ivlnce_tpu.trainers.base_trainer import BaseVLNCETrainer

    T, N, DHW, MHW = 2, 4, 64, 64
    base = get_config().clone()
    base.defrost()
    base.MODEL.policy_name = "MapCMAPolicy"
    base.MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings = False
    base.MODEL.INSTRUCTION_ENCODER.vocab_size = 32
    base.MODEL.PROGRESS_MONITOR.use = False
    base.TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT = DHW
    base.TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH = DHW
    base.CHECKPOINT_FOLDER = str(tmp_path / "ckpts")
    base.RESULTS_DIR = str(tmp_path / "results")
    base.EVAL.SAVE_RESULTS = False

    policy = MapCMAPolicy.from_config(base, {"depth_hw": DHW, "map_hw": MHW})
    init = policy.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    tn = T * N
    obs = {
        "depth": rng.random((tn, DHW, DHW, 1), np.float32) * 0.5 + 0.05,
        "occupancy_map": rng.integers(0, 2, (tn, MHW, MHW)).astype(np.uint8),
        "semantic_map": rng.integers(0, 13, (tn, MHW, MHW)).astype(np.uint8),
        "instruction": rng.integers(1, 30, (tn, 12)).astype(np.int32),
    }
    prev = rng.integers(0, 4, (tn, 1)).astype(np.int32)
    masks = np.ones((T, N), np.float32)
    corrected = rng.integers(0, 4, (T, N)).astype(np.int32)
    weights = np.ones((T, N), np.float32)

    losses = {}
    for ndp in (1, 4):
        cfg = base.clone()
        cfg.defrost()
        cfg.TPU.data_parallel_devices = ndp
        cfg.freeze()
        tr = BaseVLNCETrainer(cfg)
        tr.policy = policy
        tr.params = jax.device_put(
            jax.tree_util.tree_map(np.asarray, init)
        )
        tr.optimizer = optax.adam(1e-3)
        tr.opt_state = jax.jit(tr.optimizer.init)(tr.params)
        loss, action_loss, aux_loss, _ = tr._update_agent(
            obs, prev, masks, corrected, weights
        )
        assert np.isfinite(loss)
        losses[ndp] = loss
        if ndp == 4:
            # the dagger collate ships masks T-major flattened (T*N, 1);
            # the sharded step must accept that layout too (canonicalized
            # in _update_agent) and produce the identical loss
            tr2 = BaseVLNCETrainer(cfg)
            tr2.policy = policy
            tr2.params = jax.device_put(
                jax.tree_util.tree_map(np.asarray, init)
            )
            tr2.optimizer = optax.adam(1e-3)
            tr2.opt_state = jax.jit(tr2.optimizer.init)(tr2.params)
            loss_flat, _, _, _ = tr2._update_agent(
                obs, prev, masks.reshape(-1, 1), corrected, weights
            )
            assert abs(loss_flat - loss) <= 1e-6 * max(1.0, abs(loss))
        if ndp == 4:  # the sharded path really ran over the mesh
            n_dev = len(
                jax.tree_util.tree_leaves(tr.params)[0].sharding.device_set
            )
            assert n_dev == 4
    assert abs(losses[4] - losses[1]) <= 1e-4 * max(1.0, abs(losses[1]))


def test_trainer_dp_uses_largest_dividing_device_count(tmp_path):
    """Lanes not divisible by the full device count shard over the
    LARGEST dividing count instead of silently dropping to one device
    (the default IL.batch_size is 5 — it must still engage 5-way DP)."""
    from ivlnce_tpu.config import get_config
    from ivlnce_tpu.trainers.base_trainer import BaseVLNCETrainer

    cfg = get_config().clone()
    cfg.defrost()
    cfg.TPU.data_parallel_devices = 8
    cfg.CHECKPOINT_FOLDER = str(tmp_path / "ckpts")
    cfg.RESULTS_DIR = str(tmp_path / "results")
    cfg.EVAL.SAVE_RESULTS = False
    cfg.freeze()
    tr = BaseVLNCETrainer(cfg)
    assert tr._data_parallel_devices(3) == 3  # 3 divides 3 <= 8
    assert tr._data_parallel_devices(5) == 5
    assert tr._data_parallel_devices(7) == 7
    assert tr._data_parallel_devices(8) == 8
    assert tr._data_parallel_devices(16) == 8
    assert tr._data_parallel_devices(13) == 1  # prime > 8: nothing divides
    cfg2 = cfg.clone()
    cfg2.defrost()
    cfg2.TPU.data_parallel_devices = 1
    cfg2.freeze()
    assert BaseVLNCETrainer(cfg2)._data_parallel_devices(8) == 1  # off
