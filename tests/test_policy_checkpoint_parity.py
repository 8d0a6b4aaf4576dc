"""Full-policy checkpoint parity (VERDICT item 9): a reference-layout
torch ``.pth`` (net.* + action_distribution.*, base_il_trainer.py:143-168)
loads through load_reference_policy_checkpoint + merge_params into an
initialized policy tree, and the jitted forward reproduces the torch
replica's logits and recurrent states end to end.

The torch replicas use the reference's exact module attribute names
(map_cma_policy.py:103-274, latent_cma_policy.py:196-340) so their
state_dicts exercise the converter's name remapping at policy scope.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402

from ivlnce_tpu.config import get_config  # noqa: E402
from ivlnce_tpu.models import checkpoint_io as cio  # noqa: E402
from ivlnce_tpu.models.policy import (  # noqa: E402
    LatentCMAPolicy,
    MapCMAPolicy,
)
from tests.test_models import TorchGNResNetEncoder  # noqa: E402

HIDDEN = 64
D_OUT = 32  # DEPTH_ENCODER.output_size
M_OUT = 48  # SEMANTIC_MAP_ENCODER.output_size
R_OUT = 40  # RGB_ENCODER.output_size
VOCAB, EMB, IHID = 50, 12, 16  # instruction encoder (output 2*IHID)
MAP_CH = 8
DEPTH_HW, MAP_HW, TOKENS, B = 256, 64, 9, 3
NUM_ACTIONS = 4


def _policy_config(**model_overrides):
    cfg = get_config().clone()
    cfg.defrost()
    m = cfg.MODEL
    m.STATE_ENCODER.hidden_size = HIDDEN
    m.DEPTH_ENCODER.output_size = D_OUT
    m.DEPTH_ENCODER.ddppo_checkpoint = "NONE"
    m.SEMANTIC_MAP_ENCODER.output_size = M_OUT
    m.SEMANTIC_MAP_ENCODER.channels = MAP_CH
    m.SEMANTIC_MAP_ENCODER.last_ch_mult = 4
    m.RGB_ENCODER.output_size = R_OUT
    m.INSTRUCTION_ENCODER.vocab_size = VOCAB
    m.INSTRUCTION_ENCODER.embedding_size = EMB
    m.INSTRUCTION_ENCODER.hidden_size = IHID
    m.INSTRUCTION_ENCODER.use_pretrained_embeddings = False
    m.INSTRUCTION_ENCODER.final_state_only = False
    m.PROGRESS_MONITOR.use = True
    for k, v in model_overrides.items():
        setattr(m, k, v)
    cfg.freeze()
    return cfg


# ---------------------------------------------------------------------------
# torch replicas with the reference's module names
# ---------------------------------------------------------------------------
class TorchInstructionEncoder(tnn.Module):
    """instruction_encoder.py:11-94 (embedding_layer + encoder_rnn)."""

    def __init__(self):
        super().__init__()
        self.embedding_layer = tnn.Embedding(VOCAB, EMB, padding_idx=0)
        self.encoder_rnn = tnn.LSTM(
            EMB, IHID, bidirectional=True, batch_first=True
        )

    def forward(self, tokens):
        lengths = (tokens != 0).long().sum(dim=1)
        e = self.embedding_layer(tokens)
        packed = tnn.utils.rnn.pack_padded_sequence(
            e, lengths.cpu(), batch_first=True, enforce_sorted=False
        )
        out, _ = self.encoder_rnn(packed)
        padded = tnn.utils.rnn.pad_packed_sequence(
            out, batch_first=True, total_length=tokens.shape[1]
        )[0]
        return padded.permute(0, 2, 1)  # (B, 2H, T)


class TorchDepthEncoder(tnn.Module):
    """VlnResnetDepthEncoder, spatial_output=True
    (resnet_encoders.py:17-115)."""

    def __init__(self):
        super().__init__()
        self.visual_encoder = TorchGNResNetEncoder(spatial_size=DEPTH_HW // 2)
        # output (128, 4, 4) at 128^2 input
        self.spatial_embeddings = tnn.Embedding(4 * 4, 64)

    def forward(self, depth_nhwc):
        x = self.visual_encoder(depth_nhwc.permute(0, 3, 1, 2))
        b, c, h, w = x.shape
        sp = (
            self.spatial_embeddings(torch.arange(h * w))
            .T.view(1, -1, h, w)
            .expand(b, 64, h, w)
        )
        return torch.cat([x, sp], dim=1)


class TorchCBRA(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = tnn.Sequential(
            tnn.Conv2d(cin, cout, 7, padding="same"),
            tnn.BatchNorm2d(cout),
            tnn.ReLU(True),
            tnn.AvgPool2d(2),
        )

    def forward(self, x):
        return self.conv(x)


class TorchMapEncoder(tnn.Module):
    """SemanticMapEncoder (map_encoder.py:26-97): 14ch -> 4x CBRA."""

    def __init__(self):
        super().__init__()
        ch = MAP_CH
        self.cnn = tnn.Sequential(
            TorchCBRA(14, ch),
            TorchCBRA(ch, ch * 2),
            TorchCBRA(ch * 2, ch * 4),
            TorchCBRA(ch * 4, ch * 4),
        ).eval()

    def forward(self, occ, sem):
        occ_t = occ[:, None].float()
        sem_t = (
            torch.nn.functional.one_hot(sem.long().clamp(0, 12), 13)
            .permute(0, 3, 1, 2)
            .float()
        )
        return self.cnn(torch.cat([occ_t, sem_t], 1))


class _GRUWrap(tnn.Module):
    """habitat build_rnn_state_encoder: module attr .rnn, masked restart."""

    def __init__(self, input_size, hidden_size):
        super().__init__()
        self.rnn = tnn.GRU(input_size, hidden_size)

    def forward(self, x, h, masks):
        h = h * masks.view(1, -1, 1)
        out, h = self.rnn(x.unsqueeze(0), h.contiguous())
        return out.squeeze(0), h


def _attn(q, k, v, scale, mask=None):
    logits = torch.einsum("nc,nci->ni", q, k)
    if mask is not None:
        logits = logits - mask.float() * 1e8
    attn = torch.softmax(logits * scale, dim=1)
    return torch.einsum("ni,nci->nc", attn, v)


class TorchMapCMA(tnn.Module):
    """MapCMANet + CategoricalNet with reference names
    (map_cma_policy.py:103-368)."""

    def __init__(self):
        super().__init__()
        half = HIDDEN // 2
        instr_out = 2 * IHID
        self.instruction_encoder = TorchInstructionEncoder()
        self.depth_encoder = TorchDepthEncoder()
        self.map_encoder = TorchMapEncoder()
        self.prev_action_embedding = tnn.Embedding(NUM_ACTIONS + 1, 32)
        self.depth_linear = tnn.Sequential(
            tnn.Flatten(), tnn.Linear(192 * 16, D_OUT), tnn.ReLU(True)
        )
        self.map_linear = tnn.Sequential(
            tnn.Flatten(),
            tnn.Linear(MAP_CH * 4 * 16, M_OUT),
            tnn.ReLU(True),
        )
        self.state_encoder = _GRUWrap(D_OUT + M_OUT + 32, HIDDEN)
        self.dep_kv = tnn.Conv1d(192, half + D_OUT, 1)
        self.map_kv = tnn.Conv1d(MAP_CH * 4, half + M_OUT, 1)
        self.state_q = tnn.Linear(HIDDEN, half)
        self.text_k = tnn.Conv1d(instr_out, half, 1)
        self.text_q = tnn.Linear(instr_out, half)
        self.second_state_compress = tnn.Sequential(
            tnn.Linear(
                HIDDEN + instr_out + D_OUT + M_OUT + 32, HIDDEN
            ),
            tnn.ReLU(True),
        )
        self.second_state_encoder = _GRUWrap(HIDDEN, HIDDEN)
        self.progress_monitor = tnn.Linear(HIDDEN, 1)

    def forward(self, obs, rnn_states, prev_actions, masks):
        half = HIDDEN // 2
        scale = 1.0 / (half ** 0.5)
        txt = self.instruction_encoder(obs["instruction"])
        dep = torch.flatten(self.depth_encoder(obs["depth"]), 2)
        map_e = torch.flatten(
            self.map_encoder(obs["occupancy_map"], obs["semantic_map"]), 2
        )
        prev = self.prev_action_embedding(
            ((prev_actions.float() + 1) * masks).long().view(-1)
        )
        dep_in = self.depth_linear(dep)
        map_in = self.map_linear(map_e)
        state_in = torch.cat([dep_in, map_in, prev], dim=1)
        rnn_out = rnn_states.clone()
        h1 = rnn_states[:, 0].unsqueeze(0)
        state, h1o = self.state_encoder(state_in, h1, masks)
        rnn_out[:, 0] = h1o.squeeze(0)
        text_mask = (txt == 0.0).all(dim=1)
        temb = _attn(
            self.state_q(state), self.text_k(txt), txt, scale, text_mask
        )
        tq = self.text_q(temb)
        dk, dv = torch.split(self.dep_kv(dep), [half, D_OUT], dim=1)
        mk, mv = torch.split(self.map_kv(map_e), [half, M_OUT], dim=1)
        datt = _attn(tq, dk, dv, scale)
        matt = _attn(tq, mk, mv, scale)
        x = torch.cat([state, temb, datt, matt, prev], dim=1)
        x = self.second_state_compress(x)
        h2 = rnn_states[:, 1].unsqueeze(0)
        x, h2o = self.second_state_encoder(x, h2, masks)
        rnn_out[:, 1] = h2o.squeeze(0)
        return x, rnn_out


class TorchLatentCMA(tnn.Module):
    """LatentCMANet consuming cached rgb/depth features
    (latent_cma_policy.py:196-497)."""

    def __init__(self):
        super().__init__()
        half = HIDDEN // 2
        instr_out = 2 * IHID
        self.instruction_encoder = TorchInstructionEncoder()
        self.prev_action_embedding = tnn.Embedding(NUM_ACTIONS + 1, 32)
        self.rgb_linear = tnn.Sequential(
            tnn.AdaptiveAvgPool1d(1),
            tnn.Flatten(),
            tnn.Linear(2112, R_OUT),
            tnn.ReLU(True),
        )
        self.depth_linear = tnn.Sequential(
            tnn.Flatten(), tnn.Linear(192 * 16, D_OUT), tnn.ReLU(True)
        )
        self.state_encoder = _GRUWrap(D_OUT + R_OUT + 32, HIDDEN)
        self.rgb_kv = tnn.Conv1d(2112, half + R_OUT, 1)
        self.depth_kv = tnn.Conv1d(192, half + D_OUT, 1)
        self.state_q = tnn.Linear(HIDDEN, half)
        self.text_k = tnn.Conv1d(instr_out, half, 1)
        self.text_q = tnn.Linear(instr_out, half)
        self.second_state_compress = tnn.Sequential(
            tnn.Linear(HIDDEN + instr_out + R_OUT + D_OUT + 32, HIDDEN),
            tnn.ReLU(True),
        )
        self.second_state_encoder = _GRUWrap(HIDDEN, HIDDEN)
        self.progress_monitor = tnn.Linear(HIDDEN, 1)

    def forward(self, obs, rnn_states, prev_actions, masks):
        half = HIDDEN // 2
        scale = 1.0 / (half ** 0.5)
        txt = self.instruction_encoder(obs["instruction"])
        rgb = torch.flatten(obs["rgb_features"], 2)
        dep = torch.flatten(obs["depth_features"], 2)
        prev = self.prev_action_embedding(
            ((prev_actions.float() + 1) * masks).long().view(-1)
        )
        rgb_in = self.rgb_linear(rgb)
        dep_in = self.depth_linear(dep)
        state_in = torch.cat([rgb_in, dep_in, prev], dim=1)
        rnn_out = rnn_states.clone()
        h1 = rnn_states[:, 0].unsqueeze(0)
        state, h1o = self.state_encoder(state_in, h1, masks)
        rnn_out[:, 0] = h1o.squeeze(0)
        text_mask = (txt == 0.0).all(dim=1)
        temb = _attn(
            self.state_q(state), self.text_k(txt), txt, scale, text_mask
        )
        tq = self.text_q(temb)
        rk, rv = torch.split(self.rgb_kv(rgb), [half, R_OUT], dim=1)
        dk, dv = torch.split(self.depth_kv(dep), [half, D_OUT], dim=1)
        ratt = _attn(tq, rk, rv, scale)
        datt = _attn(tq, dk, dv, scale)
        x = torch.cat([state, temb, ratt, datt, prev], dim=1)
        x = self.second_state_compress(x)
        h2 = rnn_states[:, 1].unsqueeze(0)
        x, h2o = self.second_state_encoder(x, h2, masks)
        rnn_out[:, 1] = h2o.squeeze(0)
        return x, rnn_out


class TorchPolicy(tnn.Module):
    def __init__(self, net):
        super().__init__()
        self.net = net
        self.action_distribution = tnn.Module()
        self.action_distribution.linear = tnn.Linear(HIDDEN, NUM_ACTIONS)


def _save_reference_ckpt(tmp_path, policy):
    ckpt = {
        "state_dict": policy.state_dict(),
        "config": {"note": "parity fixture"},
        "optim_state": None,
        "epoch": 7,
        "step_id": 123,
    }
    path = str(tmp_path / "ref_policy.pth")
    torch.save(ckpt, path)
    return path


def _randomize_bn_stats(module):
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)


def test_map_cma_full_policy_checkpoint_parity(tmp_path, rng):
    torch.manual_seed(11)
    tpolicy = TorchPolicy(TorchMapCMA()).eval()
    _randomize_bn_stats(tpolicy)
    path = _save_reference_ckpt(tmp_path, tpolicy)

    config = _policy_config(policy_name="MapCMAPolicy")
    policy = MapCMAPolicy.from_config(
        config, {"depth_hw": DEPTH_HW, "map_hw": MAP_HW}
    )
    params = policy.init_params(jax.random.PRNGKey(0))
    loaded = cio.load_reference_policy_checkpoint(path)
    assert loaded["epoch"] == 7
    # merge must consume every checkpoint tensor against the init tree
    params = cio.merge_params(params, loaded["params"])

    tokens = rng.integers(1, VOCAB, (B, TOKENS)).astype(np.int64)
    tokens[0, 5:] = 0
    tokens[2, 7:] = 0
    depth = rng.uniform(0, 1, (B, DEPTH_HW, DEPTH_HW, 1)).astype(np.float32)
    occ = rng.integers(0, 2, (B, MAP_HW, MAP_HW)).astype(np.uint8)
    sem = rng.integers(0, 13, (B, MAP_HW, MAP_HW)).astype(np.uint8)
    prev = rng.integers(0, NUM_ACTIONS, (B, 1)).astype(np.int32)
    masks = np.array([[1.0], [0.0], [1.0]], np.float32)
    rnn = rng.normal(0, 0.5, (B, 2, HIDDEN)).astype(np.float32)

    with torch.no_grad():
        feats, trnn = tpolicy.net(
            {
                "instruction": torch.from_numpy(tokens),
                "depth": torch.from_numpy(depth),
                "occupancy_map": torch.from_numpy(occ),
                "semantic_map": torch.from_numpy(sem),
            },
            torch.from_numpy(rnn),
            torch.from_numpy(prev),
            torch.from_numpy(masks),
        )
        tlogits = tpolicy.action_distribution.linear(feats).numpy()
        trnn = trnn.numpy()

    out = policy.act(
        params,
        {
            "instruction": tokens.astype(np.int32),
            "depth": depth,
            "occupancy_map": occ,
            "semantic_map": sem,
        },
        rnn,
        prev,
        masks,
        deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(out.logits), tlogits, atol=2e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.rnn_states), trnn, atol=2e-3, rtol=1e-3
    )
    assert (
        np.asarray(out.actions).reshape(-1) == tlogits.argmax(-1)
    ).all()


def test_latent_cma_full_policy_checkpoint_parity(tmp_path, rng):
    torch.manual_seed(12)
    tpolicy = TorchPolicy(TorchLatentCMA()).eval()
    path = _save_reference_ckpt(tmp_path, tpolicy)

    config = _policy_config(policy_name="LatentCMAPolicy")
    policy = LatentCMAPolicy.from_config(config, {"depth_hw": DEPTH_HW})
    params = policy.init_params(jax.random.PRNGKey(1))
    loaded = cio.load_reference_policy_checkpoint(path)
    merged = cio.merge_params(params, loaded["params"])

    tokens = rng.integers(1, VOCAB, (B, TOKENS)).astype(np.int64)
    tokens[1, 4:] = 0
    rgb_feats = rng.normal(0, 1, (B, 2112, 4, 4)).astype(np.float32)
    dep_feats = rng.normal(0, 1, (B, 192, 4, 4)).astype(np.float32)
    prev = rng.integers(0, NUM_ACTIONS, (B, 1)).astype(np.int32)
    masks = np.ones((B, 1), np.float32)
    rnn = rng.normal(0, 0.5, (B, 2, HIDDEN)).astype(np.float32)

    with torch.no_grad():
        feats, trnn = tpolicy.net(
            {
                "instruction": torch.from_numpy(tokens),
                "rgb_features": torch.from_numpy(rgb_feats),
                "depth_features": torch.from_numpy(dep_feats),
            },
            torch.from_numpy(rnn),
            torch.from_numpy(prev),
            torch.from_numpy(masks),
        )
        tlogits = tpolicy.action_distribution.linear(feats).numpy()
        trnn = trnn.numpy()

    out = policy.act(
        merged,
        {
            "instruction": tokens.astype(np.int32),
            "rgb_features": rgb_feats,
            "depth_features": dep_feats,
        },
        rnn,
        prev,
        masks,
        deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(out.logits), tlogits, atol=2e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.rnn_states), trnn, atol=2e-3, rtol=1e-3
    )
