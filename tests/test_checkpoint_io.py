"""Torch checkpoint conversion tests: build small torch modules, save a
.pth, load through checkpoint_io, and verify the jnp apply functions
reproduce the torch forward exactly."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax.numpy as jnp

from ivlnce_tpu.models import checkpoint_io as cio
from ivlnce_tpu.models import nn as F
from ivlnce_tpu.models import rnn as R


def test_conv_linear_norm_state_dict_roundtrip(rng, tmp_path):
    torch.manual_seed(0)
    m = tnn.Sequential(
        tnn.Conv2d(3, 8, 3, padding=1),
        tnn.BatchNorm2d(8),
        tnn.ReLU(),
        tnn.Flatten(),
        tnn.Linear(8 * 16 * 16, 10),
    ).eval()
    params = cio.convert_state_dict(m.state_dict())

    x = rng.random((2, 16, 16, 3), np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        ref = m(xt).numpy()

    y = F.conv2d(params["0"], jnp.asarray(x), 1, 1)
    y = F.relu(F.batchnorm(params["1"], y))
    # torch Flatten on NCHW: transpose back before flattening
    y = jnp.transpose(y, (0, 3, 1, 2)).reshape(2, -1)
    y = F.linear(params["4"], y)
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)


def test_gru_state_dict_roundtrip(rng):
    torch.manual_seed(1)
    cell = tnn.GRU(12, 24, batch_first=True)
    params = cio.convert_state_dict(cell.state_dict())

    x = rng.random((3, 12), np.float32)
    h = rng.random((3, 24), np.float32)
    with torch.no_grad():
        out, _ = cell(
            torch.from_numpy(x)[:, None], torch.from_numpy(h)[None]
        )
        ref = out[:, 0].numpy()

    got = R.gru_cell(params, jnp.asarray(x), jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_reference_policy_checkpoint_loading(tmp_path):
    """A torch-saved {state_dict, config, epoch, ...} checkpoint (the
    reference's save layout, base_il_trainer.py:143-168) loads through
    load_checkpoint's .pth branch."""
    torch.manual_seed(2)
    net = tnn.Sequential(tnn.Linear(4, 8), tnn.ReLU(), tnn.Linear(8, 2))
    # the reference's policy state_dict prefixes (policy.py wraps the
    # net and the categorical head)
    state = {f"net.{k}": v for k, v in net.state_dict().items()}
    state["action_distribution.linear.weight"] = torch.zeros(4, 2)
    state["action_distribution.linear.bias"] = torch.ones(4)
    ckpt = {
        "state_dict": state,
        "config": {"TRAINER_NAME": "dagger"},
        "epoch": 3,
    }
    path = str(tmp_path / "ckpt.0.pth")
    torch.save(ckpt, path)

    loaded = cio.load_reference_policy_checkpoint(path)
    assert loaded["epoch"] == 3
    p = loaded["params"]
    np.testing.assert_allclose(
        p["0"]["w"], net[0].weight.detach().numpy(), atol=0
    )
    np.testing.assert_allclose(
        p["2"]["b"], net[2].bias.detach().numpy(), atol=0
    )
    np.testing.assert_array_equal(
        p["action_distribution"]["linear"]["b"], 1.0
    )


def test_merge_params_structural(rng):
    target = {
        "a": {"w": np.zeros((2, 2), np.float32)},
        "b": {"w": np.zeros((3,), np.float32)},
    }
    source = {"a": {"w": np.ones((2, 2), np.float32)}}
    merged = cio.merge_params(target, source)
    np.testing.assert_array_equal(merged["a"]["w"], 1.0)
    np.testing.assert_array_equal(merged["b"]["w"], 0.0)
