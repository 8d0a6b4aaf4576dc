"""Torch checkpoint <-> param pytree conversion.

Param trees in this framework mirror torch state_dict names (nested dicts
split on '.'), so conversion is mechanical:

- rank-4 'weight'  -> 'w', OIHW -> HWIO (ConvTranspose2d IOHW -> HWOI is
  the same permutation (2, 3, 1, 0));
- rank-2 'weight'  -> 'w' (torch linear layout kept);
- rank-1 'weight'  -> 'scale' (a norm layer), with running_mean/var ->
  mean/var;
- 'bias'           -> 'b' for conv/linear, 'bias' for norms (disambiguated
  by the rank of the sibling weight);
- GRU/LSTM weight_ih_l0 / weight_hh_l0 / biases -> w_ih / w_hh / b_ih /
  b_hh ('_reverse' suffixed tensors land in a sibling dict).

External checkpoint loaders replicate the reference's key surgery:
- DDPPO depth (resnet_encoders.py:48-61): strip 'actor_critic.net.' and
  keep 'visual_encoder.*';
- RedNet pkl (mapper.py:758-779): dict key 'model_state', strip 'module.';
- map encoder (map_encoder.py:62-70): 'state_dict', strip 'encoder.cnn.'.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np

Params = Dict[str, Any]

_RNN_RE = re.compile(r"^(weight|bias)_(ih|hh)_l0(_reverse)?$")


def convert_state_dict(state_dict: Dict[str, "np.ndarray"]) -> Params:
    """Convert a flat torch state_dict (tensors or ndarrays) to a nested
    param tree following this framework's conventions."""
    arrays: Dict[str, np.ndarray] = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        arrays[k] = np.asarray(v)

    root: Params = {}
    # group by parent module so weight rank can disambiguate bias naming
    by_module: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in arrays.items():
        parts = k.split(".")
        mod, leaf = ".".join(parts[:-1]), parts[-1]
        by_module.setdefault(mod, {})[leaf] = v

    for mod, leaves in by_module.items():
        node = root
        if mod:
            for p in mod.split("."):
                node = node.setdefault(p, {})
        _convert_module(node, leaves)
    return root


def _convert_module(node: Params, leaves: Dict[str, np.ndarray]) -> None:
    weight = leaves.get("weight")
    is_norm = weight is not None and weight.ndim == 1
    has_running = "running_mean" in leaves

    for leaf, v in leaves.items():
        m = _RNN_RE.match(leaf)
        if m:
            kind, gate, rev = m.groups()
            key = ("w_" if kind == "weight" else "b_") + gate
            if rev:
                node.setdefault("_reverse", {})[key] = v
            else:
                node[key] = v
        elif leaf == "weight":
            if v.ndim == 4:
                node["w"] = np.transpose(v, (2, 3, 1, 0))
            elif v.ndim == 1:
                node["scale"] = v
            else:
                node["w"] = v
        elif leaf == "bias":
            node["bias" if (is_norm or has_running) else "b"] = v
        elif leaf == "running_mean":
            node["mean"] = v
        elif leaf == "running_var":
            node["var"] = v
        elif leaf == "num_batches_tracked":
            pass
        else:
            node[leaf] = v


def merge_params(target: Params, source: Params, path: str = "") -> Params:
    """Structurally merge converted weights into an initialized tree,
    asserting shape agreement (catches layout drift early)."""
    out = dict(target)
    for k, v in source.items():
        if isinstance(v, dict):
            if k not in target or not isinstance(target[k], dict):
                raise KeyError(f"unexpected module {path}{k}")
            out[k] = merge_params(target[k], v, f"{path}{k}.")
        else:
            if k not in target:
                raise KeyError(f"unexpected tensor {path}{k}")
            tgt = np.asarray(target[k])
            if tuple(tgt.shape) != tuple(v.shape):
                raise ValueError(
                    f"shape mismatch at {path}{k}: "
                    f"checkpoint {v.shape} vs model {tgt.shape}"
                )
            out[k] = v.astype(tgt.dtype)
    return out


# -----------------------------------------------------------------------------
# external checkpoint loaders (reference key surgery)
# -----------------------------------------------------------------------------
def load_torch_file(path: str):
    import torch

    return torch.load(path, map_location="cpu")


def load_ddppo_depth_encoder(path: str) -> Params:
    """gibson-2plus-resnet50.pth -> visual_encoder params
    (resnet_encoders.py:48-61)."""
    ckpt = load_torch_file(path)
    weights = {}
    for k, v in ckpt["state_dict"].items():
        parts = k.split(".")[2:]
        if not parts or parts[0] != "visual_encoder":
            continue
        weights[".".join(parts[1:])] = v
    return convert_state_dict(weights)


def load_rednet(path: str) -> Params:
    """rednet_mp3d_best_model.pkl (mapper.py:758-779)."""
    ckpt = load_torch_file(path)
    state = ckpt["model_state"]
    first = next(iter(state))
    if first.startswith("module."):
        state = {k[len("module."):]: v for k, v in state.items()}
    return convert_state_dict(state)


def load_map_encoder(path: str) -> Params:
    """pretrained map encoder (map_encoder.py:62-70): keys under
    'encoder.cnn.'."""
    ckpt = load_torch_file(path)
    prefix = "encoder.cnn."
    state = {
        k[len(prefix):]: v
        for k, v in ckpt["state_dict"].items()
        if k.startswith(prefix)
    }
    return {"cnn": convert_state_dict(state)}


# reference rgb_encoder.cnn is Sequential(*resnet.children()[:-1])
# (resnet_encoders.py:139): positional indices -> torchvision stage names
# (2=relu / 3=maxpool have no parameters)
_RESNET_SEQ_TO_NAME = {
    "0": "conv1", "1": "bn1",
    "4": "layer1", "5": "layer2", "6": "layer3", "7": "layer4",
}

# kernel-size-1 Conv1d attention projections: torch stores (out, in, 1),
# this framework stores (out, in) (models/nn.py:conv1d)
_CONV1D_KEYS = ("dep_kv", "map_kv", "rgb_kv", "depth_kv", "text_k")


def remap_reference_policy_params(params: Params) -> Params:
    """Translate the reference policy's torch module names onto this
    framework's param-tree names (init_map_cma / init_latent_cma):

    - instruction_encoder.embedding_layer -> .embedding;
      .encoder_rnn (+_reverse)            -> .lstm_fwd / .lstm_bwd
    - state_encoder.rnn / second_state_encoder.rnn -> flattened (habitat's
      RNNStateEncoder wraps the GRU in an .rnn attribute)
    - rgb_encoder.cnn.<seq idx> -> torchvision stage names
    - kv/text_k Conv1d weights squeeze their trailing kernel dim
    - the '_scale' attention buffer is dropped (a constant)
    """
    p = dict(params)
    ie = p.get("instruction_encoder")
    if isinstance(ie, dict):
        ie = dict(ie)
        if "embedding_layer" in ie:
            ie["embedding"] = ie.pop("embedding_layer")
        rnn = ie.pop("encoder_rnn", None)
        if rnn is not None:
            rnn = dict(rnn)
            bwd = rnn.pop("_reverse", None)
            ie["lstm_fwd"] = rnn
            if bwd is not None:
                ie["lstm_bwd"] = bwd
        p["instruction_encoder"] = ie
    for k in ("state_encoder", "second_state_encoder"):
        node = p.get(k)
        if isinstance(node, dict) and set(node) == {"rnn"}:
            p[k] = node["rnn"]
    for k in _CONV1D_KEYS:
        node = p.get(k)
        if isinstance(node, dict):
            w = node.get("w")
            if w is not None and w.ndim == 3 and w.shape[-1] == 1:
                p[k] = {**node, "w": w[..., 0]}
    rgb = p.get("rgb_encoder")
    if isinstance(rgb, dict) and isinstance(rgb.get("cnn"), dict):
        cnn = rgb["cnn"]
        if any(idx in cnn for idx in _RESNET_SEQ_TO_NAME):
            new = {
                name: cnn[idx]
                for idx, name in _RESNET_SEQ_TO_NAME.items()
                if idx in cnn
            }
            for k2, v2 in cnn.items():
                if k2 not in _RESNET_SEQ_TO_NAME:
                    new.setdefault(k2, v2)
            p["rgb_encoder"] = {**rgb, "cnn": new}
    p.pop("_scale", None)
    return p


def load_reference_policy_checkpoint(path: str) -> Dict[str, Any]:
    """A full reference training checkpoint: dict with state_dict, config,
    optim_state, epoch... (base_il_trainer.py:143-168). Returns the raw
    dict with state_dict converted to a param tree (keys under 'net.' and
    'action_distribution.') remapped onto this framework's names."""
    ckpt = load_torch_file(path)
    state = ckpt["state_dict"]
    net = {
        k[len("net."):]: v for k, v in state.items() if k.startswith("net.")
    }
    head = {
        k[len("action_distribution."):]: v
        for k, v in state.items()
        if k.startswith("action_distribution.")
    }
    if net or head:
        params = remap_reference_policy_params(convert_state_dict(net))
        params["action_distribution"] = convert_state_dict(head)
    else:
        # unprefixed layout (this framework's own pickle checkpoints)
        params = convert_state_dict(state)
    return {**{k: v for k, v in ckpt.items() if k != "state_dict"},
            "params": params}
