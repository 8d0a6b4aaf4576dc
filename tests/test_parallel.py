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
