"""RedNet parity: our JAX inference path vs a compact torch replica of the
reference architecture (mapping_module/rednet.py), weights converted
through checkpoint_io. Small channel widths keep CPU runtime sane; the
architecture topology (two encoder streams, agant fusions, transposed
decoder) is identical."""

import numpy as np
import torch
import torch.nn as tnn

from ivlnce_tpu.models.checkpoint_io import convert_state_dict, merge_params


def bottleneck(inp, planes, stride=1):
    down = None
    if stride != 1 or inp != planes * 4:
        down = tnn.Sequential(
            tnn.Conv2d(inp, planes * 4, 1, stride, bias=False),
            tnn.BatchNorm2d(planes * 4),
        )

    class B(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(inp, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.downsample = down

        def forward(self, x):
            r = x if self.downsample is None else self.downsample(x)
            o = torch.relu(self.bn1(self.conv1(x)))
            o = torch.relu(self.bn2(self.conv2(o)))
            o = self.bn3(self.conv3(o))
            return torch.relu(o + r)

    return B()


def trans_block(inp, planes, stride=1, upsample=None):
    class T(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(inp, inp, 3, 1, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(inp)
            if upsample is not None and stride != 1:
                self.conv2 = tnn.ConvTranspose2d(
                    inp, planes, 3, stride, 1, output_padding=1, bias=False
                )
            else:
                self.conv2 = tnn.Conv2d(inp, planes, 3, stride, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.upsample = upsample

        def forward(self, x):
            r = x if self.upsample is None else self.upsample(x)
            o = torch.relu(self.bn1(self.conv1(x)))
            o = self.bn2(self.conv2(o))
            return torch.relu(o + r)

    return T()


class TorchRedNetReplica(tnn.Module):
    """Reference RedNet topology at reduced width for test speed."""

    LAYERS = [2, 2, 2, 2]
    TRANS = [3, 2, 2, 2]

    def __init__(self, num_classes=13, w=4):
        super().__init__()
        ws = [w, w * 2, w * 4, w * 8]
        self.conv1 = tnn.Conv2d(3, w, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(w)
        self.conv1_d = tnn.Conv2d(1, w, 7, 2, 3, bias=False)
        self.bn1_d = tnn.BatchNorm2d(w)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)

        def make_stages(suffix):
            inp = w
            for si, (planes, blocks) in enumerate(zip(ws, self.LAYERS)):
                stride = 1 if si == 0 else 2
                blocks_l = []
                for bi in range(blocks):
                    s = stride if bi == 0 else 1
                    blocks_l.append(bottleneck(inp, planes, s))
                    inp = planes * 4
                setattr(self, f"layer{si+1}{suffix}", tnn.Sequential(*blocks_l))

        make_stages("")
        make_stages("_d")

        def make_transpose(inp, planes, blocks, stride):
            layers = []
            for _ in range(1, blocks):
                layers.append(trans_block(inp, inp))
            if stride != 1:
                up = tnn.Sequential(
                    tnn.ConvTranspose2d(inp, planes, 2, stride, 0, bias=False),
                    tnn.BatchNorm2d(planes),
                )
            elif inp != planes:
                up = tnn.Sequential(
                    tnn.Conv2d(inp, planes, 1, 1, bias=False),
                    tnn.BatchNorm2d(planes),
                )
            else:
                up = None
            layers.append(trans_block(inp, planes, stride, up))
            return tnn.Sequential(*layers), planes

        inp = ws[3]
        self.deconv1, inp = make_transpose(inp, ws[2], self.TRANS[0], 2)
        self.deconv2, inp = make_transpose(inp, ws[1], self.TRANS[1], 2)
        self.deconv3, inp = make_transpose(inp, ws[0], self.TRANS[2], 2)
        self.deconv4, inp = make_transpose(inp, ws[0], self.TRANS[3], 2)

        def agant(i, o):
            return tnn.Sequential(
                tnn.Conv2d(i, o, 1, 1, 0, bias=False),
                tnn.BatchNorm2d(o),
                tnn.ReLU(True),
            )

        self.agant0 = agant(w, w)
        self.agant1 = agant(ws[0] * 4, ws[0])
        self.agant2 = agant(ws[1] * 4, ws[1])
        self.agant3 = agant(ws[2] * 4, ws[2])
        self.agant4 = agant(ws[3] * 4, ws[3])
        self.final_conv, inp = make_transpose(w, w, 3, 1)
        self.final_deconv_custom = tnn.ConvTranspose2d(
            inp, num_classes, 2, 2, 0, bias=True
        )

    def forward(self, rgb, depth):
        x = torch.relu(self.bn1(self.conv1(rgb)))
        d = torch.relu(self.bn1_d(self.conv1_d(depth)))
        fuse0 = x + d
        x = self.maxpool(fuse0)
        d = self.maxpool(d)
        x = self.layer1(x)
        d = self.layer1_d(d)
        fuse1 = x + d
        x = self.layer2(fuse1)
        d = self.layer2_d(d)
        fuse2 = x + d
        x = self.layer3(fuse2)
        d = self.layer3_d(d)
        fuse3 = x + d
        x = self.layer4(fuse3)
        d = self.layer4_d(d)
        fuse4 = x + d
        x = self.deconv1(self.agant4(fuse4))
        x = x + self.agant3(fuse3)
        x = self.deconv2(x)
        x = x + self.agant2(fuse2)
        x = self.deconv3(x)
        x = x + self.agant1(fuse1)
        x = self.deconv4(x)
        x = x + self.agant0(fuse0)
        x = self.final_conv(x)
        return self.final_deconv_custom(x)


def test_rednet_matches_torch_replica(rng):
    import jax

    from ivlnce_tpu.models import rednet as RD

    torch.manual_seed(7)
    tm = TorchRedNetReplica(num_classes=13, w=4).eval()
    for m in tm.modules():
        if isinstance(m, tnn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    H = 64
    rgb = rng.normal(size=(1, H, H, 3)).astype(np.float32)
    depth = rng.normal(size=(1, H, H, 1)).astype(np.float32)

    with torch.no_grad():
        ref = tm(
            torch.from_numpy(rgb.transpose(0, 3, 1, 2)),
            torch.from_numpy(depth.transpose(0, 3, 1, 2)),
        ).numpy()

    # init with matching reduced widths
    RD_LAYERS, RD_TRANS = RD.LAYERS, RD.TRANS_LAYERS
    RD.LAYERS, RD.TRANS_LAYERS = TorchRedNetReplica.LAYERS, TorchRedNetReplica.TRANS
    try:
        import ivlnce_tpu.models.resnet as RN

        # patch stage widths for the reduced test model
        p = init_small_rednet(jax.random.PRNGKey(0), RD, RN, w=4)
    finally:
        RD.LAYERS, RD.TRANS_LAYERS = RD_LAYERS, RD_TRANS

    p = merge_params(p, convert_state_dict(tm.state_dict()))
    ours = RD.apply_rednet(p, rgb, depth)
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=1e-3, rtol=1e-3
    )


def init_small_rednet(key, RD, RN, w=4):
    """Mirror RD.init_rednet with reduced widths (test only)."""
    import jax

    from ivlnce_tpu.models import nn as F

    ks = jax.random.split(key, 20)
    ws = [w, w * 2, w * 4, w * 8]
    p = {
        "conv1": F.init_conv2d(ks[0], 3, w, 7, bias=False),
        "bn1": F.init_batchnorm(w),
        "conv1_d": F.init_conv2d(ks[1], 1, w, 7, bias=False),
        "bn1_d": F.init_batchnorm(w),
    }

    def stages(keybase, suffix):
        inplanes = w
        for si, (planes, blocks) in enumerate(zip(ws, RD.LAYERS)):
            stride = 1 if si == 0 else 2
            bkeys = jax.random.split(ks[keybase + si], blocks)
            stage = {}
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                ds = bi == 0 and (s != 1 or inplanes != planes * 4)
                stage[str(bi)] = RN.init_bn_bottleneck(
                    bkeys[bi], inplanes, planes, s, ds
                )
                inplanes = planes * 4
            p[f"layer{si+1}{suffix}"] = stage

    stages(2, "")
    stages(6, "_d")

    inplanes = ws[3]
    for di, (planes, blocks) in enumerate(
        zip([ws[2], ws[1], ws[0], ws[0]], RD.TRANS_LAYERS)
    ):
        p[f"deconv{di+1}"], inplanes = RD._init_transpose_stage(
            ks[10 + di], inplanes, planes, blocks, stride=2
        )

    p["agant0"] = RD._init_agant(ks[14], w, w)
    p["agant1"] = RD._init_agant(ks[15], ws[0] * 4, ws[0])
    p["agant2"] = RD._init_agant(ks[16], ws[1] * 4, ws[1])
    p["agant3"] = RD._init_agant(ks[17], ws[2] * 4, ws[2])
    p["agant4"] = RD._init_agant(ks[18], ws[3] * 4, ws[3])
    p["final_conv"], inplanes = RD._init_transpose_stage(
        ks[19], w, w, 3, stride=1
    )
    p["final_deconv_custom"] = F.init_conv_transpose2d(
        jax.random.fold_in(key, 99), inplanes, 13, 2, bias=True
    )
    return p
