"""Layer- and encoder-level parity tests vs torch (the reference runtime).

Torch modules here are built from the documented reference structure
(resnet_encoders.py, map_encoder.py, habitat-baselines v0.1.7 ddppo
resnet) and weights are converted through models/checkpoint_io.py — so
these tests validate both the JAX ops and the converter."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

from ivlnce_tpu.models import nn as F
from ivlnce_tpu.models import resnet as RN
from ivlnce_tpu.models.checkpoint_io import convert_state_dict, merge_params

ATOL = 2e-4
RTOL = 1e-4


def conv_params(tconv):
    return convert_state_dict(tconv.state_dict())


def test_conv2d_matches_torch(rng):
    torch.manual_seed(0)
    tc = tnn.Conv2d(3, 8, kernel_size=7, stride=2, padding=3, bias=True)
    x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tc(torch.from_numpy(x)).numpy()
    ours = F.conv2d(conv_params(tc), x.transpose(0, 2, 3, 1), 2, 3)
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=ATOL, rtol=RTOL
    )


def test_conv_transpose2d_matches_torch(rng):
    torch.manual_seed(0)
    for k, s, pad, opad in [(2, 2, 0, 0), (3, 2, 1, 1), (3, 1, 1, 0)]:
        tc = tnn.ConvTranspose2d(
            6, 4, kernel_size=k, stride=s, padding=pad, output_padding=opad
        )
        x = rng.normal(size=(2, 6, 8, 8)).astype(np.float32)
        with torch.no_grad():
            ref = tc(torch.from_numpy(x)).numpy()
        ours = F.conv_transpose2d(
            conv_params(tc), x.transpose(0, 2, 3, 1), s, pad, opad
        )
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 3, 1, 2),
            ref,
            atol=ATOL,
            rtol=RTOL,
            err_msg=f"k={k} s={s} p={pad} op={opad}",
        )


def test_batchnorm_groupnorm_pools_match_torch(rng):
    x = rng.normal(size=(2, 6, 9, 9)).astype(np.float32)
    tx = torch.from_numpy(x)
    xh = x.transpose(0, 2, 3, 1)

    bn = tnn.BatchNorm2d(6).eval()
    with torch.no_grad():
        bn.running_mean.normal_()
        bn.running_var.uniform_(0.5, 2.0)
        bn.weight.normal_()
        bn.bias.normal_()
        ref = bn(tx).numpy()
    ours = F.batchnorm(convert_state_dict(bn.state_dict()), xh)
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=ATOL, rtol=RTOL
    )

    gn = tnn.GroupNorm(3, 6)
    with torch.no_grad():
        gn.weight.normal_()
        gn.bias.normal_()
        ref = gn(tx).numpy()
    ours = F.groupnorm(convert_state_dict(gn.state_dict()), xh, 3)
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=ATOL, rtol=RTOL
    )

    with torch.no_grad():
        ref = tnn.MaxPool2d(3, 2, 1)(tx).numpy()
    ours = F.max_pool(xh, 3, 2, 1)
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=ATOL, rtol=RTOL
    )

    with torch.no_grad():
        ref = torch.nn.functional.avg_pool2d(tx, 2).numpy()
    ours = F.avg_pool(xh, 2)
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=ATOL, rtol=RTOL
    )

    with torch.no_grad():
        ref = torch.nn.functional.adaptive_avg_pool2d(tx, (4, 4)).numpy()
    ours = F.adaptive_avg_pool(xh, (4, 4))
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=ATOL, rtol=RTOL
    )


# -- torch replica of the habitat-baselines v0.1.7 ddppo GroupNorm resnet ----
class TorchGNBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, ngroups, stride=1, downsample=None):
        super().__init__()
        self.convs = tnn.Sequential(
            tnn.Conv2d(inplanes, planes, 1, bias=False),
            tnn.GroupNorm(ngroups, planes),
            tnn.ReLU(True),
            tnn.Conv2d(planes, planes, 3, stride, 1, bias=False),
            tnn.GroupNorm(ngroups, planes),
            tnn.ReLU(True),
            tnn.Conv2d(planes, planes * 4, 1, bias=False),
            tnn.GroupNorm(ngroups, planes * 4),
        )
        self.downsample = downsample
        self.relu = tnn.ReLU(True)

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        return self.relu(self.convs(x) + identity)


class TorchGNResNetEncoder(tnn.Module):
    """habitat ResNetEncoder(depth): avg_pool2d(2) -> resnet50 backbone ->
    compression conv."""

    def __init__(self, spatial_size, baseplanes=32, ngroups=16, layers=(3, 4, 6, 3)):
        super().__init__()
        backbone = tnn.Module()
        backbone.conv1 = tnn.Sequential(
            tnn.Conv2d(1, baseplanes, 7, 2, 3, bias=False),
            tnn.GroupNorm(ngroups, baseplanes),
            tnn.ReLU(True),
        )
        backbone.maxpool = tnn.MaxPool2d(3, 2, 1)
        inplanes = baseplanes
        for si, (planes, blocks) in enumerate(
            zip([baseplanes, baseplanes * 2, baseplanes * 4, baseplanes * 8], layers)
        ):
            stride = 1 if si == 0 else 2
            stage = []
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                ds = None
                if bi == 0 and (s != 1 or inplanes != planes * 4):
                    ds = tnn.Sequential(
                        tnn.Conv2d(inplanes, planes * 4, 1, s, bias=False),
                        tnn.GroupNorm(ngroups, planes * 4),
                    )
                stage.append(TorchGNBottleneck(inplanes, planes, ngroups, s, ds))
                inplanes = planes * 4
            setattr(backbone, f"layer{si + 1}", tnn.Sequential(*stage))
        self.backbone = backbone
        final_spatial = spatial_size // 32
        num_compression = int(round(2048 / (final_spatial**2)))
        self.compression = tnn.Sequential(
            tnn.Conv2d(inplanes, num_compression, 3, padding=1, bias=False),
            tnn.GroupNorm(1, num_compression),
            tnn.ReLU(True),
        )

    def forward(self, depth_nchw):
        x = torch.nn.functional.avg_pool2d(depth_nchw, 2)
        b = self.backbone
        x = b.maxpool(b.conv1(x))
        for i in range(1, 5):
            x = getattr(b, f"layer{i}")(x)
        return self.compression(x)


def test_ddppo_resnet_encoder_matches_torch_replica(rng):
    torch.manual_seed(3)
    spatial = 64  # depth 128 -> avgpool 64 -> /32 = 2
    tenc = TorchGNResNetEncoder(spatial_size=spatial).eval()
    depth = rng.uniform(0, 1, (2, 128, 128, 1)).astype(np.float32)

    with torch.no_grad():
        ref = tenc(torch.from_numpy(depth.transpose(0, 3, 1, 2))).numpy()

    p, shape = RN.init_resnet_encoder(
        __import__("jax").random.PRNGKey(0), spatial
    )
    p = merge_params(p, convert_state_dict(tenc.state_dict()))
    ours = RN.apply_resnet_encoder(p, depth)
    assert np.asarray(ours).transpose(0, 3, 1, 2).shape == ref.shape
    assert shape == ref.shape[1:]
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=5e-4, rtol=1e-3
    )


def test_torchvision_resnet50_trunk_matches(rng):
    torchvision = pytest.importorskip("torchvision")

    torch.manual_seed(4)
    tm = torchvision.models.resnet50(weights=None).eval()
    # randomize BN stats so eval mode is non-trivial
    for m in tm.modules():
        if isinstance(m, tnn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    x = rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2)) / 255.0
        t = tm.conv1(t)
        t = tm.bn1(t)
        t = tm.relu(t)
        t = tm.maxpool(t)
        for layer in [tm.layer1, tm.layer2, tm.layer3, tm.layer4]:
            t = layer(t)
        ref = t.numpy()

    import jax

    p = RN.init_bn_resnet50_trunk(jax.random.PRNGKey(0))
    state = {
        k: v
        for k, v in tm.state_dict().items()
        if not k.startswith("fc.")
    }
    p = merge_params(p, convert_state_dict(state))
    ours = RN.apply_bn_resnet50_trunk(p, x / 255.0)
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=1e-3, rtol=1e-3
    )


def test_map_encoder_matches_torch_replica(rng):
    import jax

    from ivlnce_tpu.models.map_encoder import apply_map_encoder, init_map_encoder

    torch.manual_seed(5)

    class CBRA(tnn.Module):
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

    ch = 8
    tenc = tnn.Sequential(
        CBRA(14, ch), CBRA(ch, ch * 2), CBRA(ch * 2, ch * 4), CBRA(ch * 4, ch * 4)
    ).eval()
    for m in tenc.modules():
        if isinstance(m, tnn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    occ = rng.integers(0, 2, (2, 64, 64)).astype(np.uint8)
    sem = rng.integers(0, 13, (2, 64, 64)).astype(np.uint8)

    with torch.no_grad():
        occ_t = torch.from_numpy(occ)[:, None].float()
        sem_t = torch.nn.functional.one_hot(
            torch.from_numpy(sem).long(), 13
        ).permute(0, 3, 1, 2).float()
        ref = tenc(torch.cat([occ_t, sem_t], 1)).numpy()

    p, shape = init_map_encoder(
        jax.random.PRNGKey(0), (64, 64), 13, ch, last_ch_mult=4
    )
    p = merge_params(p, {"cnn": convert_state_dict(tenc.state_dict())})
    ours = apply_map_encoder(p, occ, sem, 13, training=False)
    assert shape == ref.shape[1:]
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4, rtol=1e-3)


def test_instruction_encoder_matches_torch(rng):
    """Full instruction path: embedding -> packed bi-LSTM -> padded (B, 2H, T)
    with zeros at padding (instruction_encoder.py:63-94)."""
    import jax

    from ivlnce_tpu.config import get_config
    from ivlnce_tpu.models.instruction_encoder import (
        apply_instruction_encoder,
        init_instruction_encoder,
    )

    cfg = get_config().MODEL.INSTRUCTION_ENCODER.clone()
    cfg.defrost()
    cfg.vocab_size = 50
    cfg.embedding_size = 12
    cfg.hidden_size = 16
    cfg.use_pretrained_embeddings = False
    cfg.final_state_only = False
    cfg.freeze()

    torch.manual_seed(6)
    emb = tnn.Embedding(50, 12, padding_idx=0)
    lstm = tnn.LSTM(12, 16, bidirectional=True)

    B, T = 3, 11
    tokens = rng.integers(1, 50, (B, T)).astype(np.int64)
    lengths = np.array([11, 5, 8])
    for b, L in enumerate(lengths):
        tokens[b, L:] = 0

    with torch.no_grad():
        e = emb(torch.from_numpy(tokens))
        packed = tnn.utils.rnn.pack_padded_sequence(
            e, torch.from_numpy(lengths), batch_first=True, enforce_sorted=False
        )
        out, _ = lstm(packed)
        ref = (
            tnn.utils.rnn.pad_packed_sequence(
                out, batch_first=True, total_length=T
            )[0]
            .permute(0, 2, 1)
            .numpy()
        )

    params = init_instruction_encoder(jax.random.PRNGKey(0), cfg)
    params["embedding"] = convert_state_dict(emb.state_dict())
    sd = lstm.state_dict()
    params["lstm_fwd"] = convert_state_dict(
        {k: v for k, v in sd.items() if not k.endswith("_reverse")}
    )
    params["lstm_bwd"] = convert_state_dict(
        {
            k.replace("_reverse", ""): v
            for k, v in sd.items()
            if k.endswith("_reverse")
        }
    )
    ours = apply_instruction_encoder(params, cfg, {"instruction": tokens})
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-5, rtol=1e-4)


class _TorchBasicBlock(tnn.Module):
    """torchvision BasicBlock replica (torchvision absent in-image)."""

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + idn)


class _TorchResNet18Trunk(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        inplanes = 64
        for si, planes in enumerate([64, 128, 256, 512]):
            stride = 1 if si == 0 else 2
            blocks = []
            for bi in range(2):
                s = stride if bi == 0 else 1
                ds = None
                if bi == 0 and (s != 1 or inplanes != planes):
                    ds = tnn.Sequential(
                        tnn.Conv2d(inplanes, planes, 1, s, bias=False),
                        tnn.BatchNorm2d(planes),
                    )
                blocks.append(_TorchBasicBlock(inplanes, planes, s, ds))
                inplanes = planes
            setattr(self, f"layer{si + 1}", tnn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        return x


def test_torchvision_resnet18_trunk_matches(rng):
    torch.manual_seed(7)
    tm = _TorchResNet18Trunk().eval()
    for m in tm.modules():
        if isinstance(m, tnn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    x = rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2)) / 255.0
        ref = tm(t).numpy()

    import jax

    p = RN.init_bn_resnet18_trunk(jax.random.PRNGKey(0))
    state = {
        k: v for k, v in tm.state_dict().items() if not k.startswith("fc.")
    }
    p = merge_params(p, convert_state_dict(state))
    ours = RN.apply_bn_resnet18_trunk(p, x / 255.0)
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=1e-3, rtol=1e-3
    )


def test_latent_cma_resnet18_variant_builds(rng):
    """cnn_type=TorchVisionResNet18 changes the rgb trunk + kv dims."""
    import jax

    from ivlnce_tpu.config import get_config
    from ivlnce_tpu.models.cma import init_latent_cma, apply_latent_cma

    cfg = get_config().MODEL.clone()
    cfg.defrost()
    cfg.RGB_ENCODER.cnn_type = "TorchVisionResNet18"
    cfg.INSTRUCTION_ENCODER.vocab_size = 40
    cfg.INSTRUCTION_ENCODER.use_pretrained_embeddings = False
    cfg.INSTRUCTION_ENCODER.final_state_only = False
    cfg.compute_dtype = "float32"
    cfg.freeze()

    params = init_latent_cma(jax.random.PRNGKey(0), cfg, 64)
    assert params["rgb_kv"]["w"].shape[1] == 512 + 64  # resnet18 channels
    obs = {
        "instruction": rng.integers(1, 40, (2, 8)).astype(np.int32),
        "rgb": rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8),
        "depth": rng.uniform(0, 1, (2, 64, 64, 1)).astype(np.float32),
    }
    rnn = np.zeros((2, 2, cfg.STATE_ENCODER.hidden_size), np.float32)
    feats, rnn_out = apply_latent_cma(
        params, cfg, obs, rnn, np.zeros((2, 1), np.int32),
        np.ones((2, 1), np.float32),
    )
    assert feats.shape == (2, cfg.STATE_ENCODER.hidden_size)
    assert np.isfinite(np.asarray(feats)).all()
