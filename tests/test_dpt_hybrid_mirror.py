"""MiDaS DPT-hybrid full-architecture torch mirror A/B.

Re-creates the upstream `dpt_hybrid-midas-501f0c75.pt` module tree in torch
(timm hybrid naming: pretrained.model.patch_embed.backbone ResNetV2 with
weight-standardized convs + GroupNorm, pretrained.model.blocks ViT-B,
pretrained.act_postprocess3/4 project-readout, scratch.* DPT fusion) and
checks numeric parity through convert_dpt_hybrid — including the
align_corners=True fusion/head upsample convention
(annotator/midas/midas/blocks.py:223,336, dpt_depth.py:94).
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

import stablediffusioneo_tpu.annotators.midas_hybrid as mh

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier

FEAT = 32  # DPT feature width (scaled down from 256; converter is agnostic)
C = 768    # ViT-B hidden


class StdConv2d(nn.Conv2d):
    def forward(self, x):
        w = self.weight
        mean = w.mean(dim=(1, 2, 3), keepdim=True)
        var = w.var(dim=(1, 2, 3), unbiased=False, keepdim=True)
        w = (w - mean) / torch.sqrt(var + 1e-6)
        return F.conv2d(x, w, self.bias, self.stride, self.padding)


def gn(c):
    return nn.GroupNorm(32, c, eps=1e-5)


class PreActBottleneck(nn.Module):
    def __init__(self, cin, cout, mid, stride=1, proj=False):
        super().__init__()
        self.norm1 = gn(cin)
        self.conv1 = StdConv2d(cin, mid, 1, bias=False)
        self.norm2 = gn(mid)
        self.conv2 = StdConv2d(mid, mid, 3, stride=stride, padding=1, bias=False)
        self.norm3 = gn(mid)
        self.conv3 = StdConv2d(mid, cout, 1, bias=False)
        if proj:
            self.downsample = nn.Module()
            self.downsample.conv = StdConv2d(cin, cout, 1, stride=stride,
                                             bias=False)

    def forward(self, x):
        pre = F.relu(self.norm1(x))
        shortcut = self.downsample.conv(pre) if hasattr(self, "downsample") else x
        h = self.conv1(pre)
        h = self.conv2(F.relu(self.norm2(h)))
        h = self.conv3(F.relu(self.norm3(h)))
        return h + shortcut


class ResNetV2(nn.Module):
    def __init__(self):
        super().__init__()
        self.stem = nn.Module()
        self.stem.conv = StdConv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.stem.norm = gn(64)
        self.stages = nn.ModuleList()
        cin = 64
        for si, (nb, cout, mid) in enumerate(
                zip(mh.STAGE_BLOCKS, mh.STAGE_OUT, mh.STAGE_MID)):
            stage = nn.Module()
            stage.blocks = nn.ModuleList()
            for bi in range(nb):
                stride = 2 if (bi == 0 and si > 0) else 1
                stage.blocks.append(PreActBottleneck(
                    cin if bi == 0 else cout, cout, mid, stride=stride,
                    proj=(bi == 0)))
            self.stages.append(stage)
            cin = cout

    def forward(self, x):
        h = F.relu(self.stem.norm(self.stem.conv(x)))
        h = F.max_pool2d(h, 3, stride=2, padding=1)
        taps = []
        for si, stage in enumerate(self.stages):
            for blk in stage.blocks:
                h = blk(h)
            if si < 2:
                taps.append(h)
        return h, taps


class ViTBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = nn.LayerNorm(C, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(C, 3 * C, bias=True)
        self.attn.proj = nn.Linear(C, C)
        self.norm2 = nn.LayerNorm(C, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(C, 4 * C)
        self.mlp.fc2 = nn.Linear(4 * C, C)

    def forward(self, x):
        b, t, c = x.shape
        heads = 12
        qkv = self.attn.qkv(self.norm1(x)).reshape(b, t, 3, heads, c // heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        att = (q @ k.transpose(-2, -1)) * (c // heads) ** -0.5
        o = (att.softmax(-1) @ v).transpose(1, 2).reshape(b, t, c)
        x = x + self.attn.proj(o)
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))


class Mirror(nn.Module):
    """pretrained.model.* + pretrained.act_postprocess* + scratch.*"""

    def __init__(self, grid=4):
        super().__init__()
        self.pretrained = nn.Module()
        model = nn.Module()
        model.patch_embed = nn.Module()
        model.patch_embed.backbone = ResNetV2()
        model.patch_embed.proj = nn.Conv2d(1024, C, 1)
        model.cls_token = nn.Parameter(torch.zeros(1, 1, C))
        model.pos_embed = nn.Parameter(
            torch.randn(1, 1 + grid * grid, C) * 0.01)
        model.blocks = nn.ModuleList([ViTBlock() for _ in range(12)])
        self.pretrained.model = model
        for i in (3, 4):
            pp = nn.Module()
            project = nn.Sequential(nn.Linear(2 * C, C))
            pp.add_module("0", nn.Module())
            getattr(pp, "0").project = project
            pp.add_module("3", nn.Conv2d(C, C, 1))
            if i == 4:
                pp.add_module("4", nn.Conv2d(C, C, 3, stride=2, padding=1))
            setattr(self.pretrained, f"act_postprocess{i}", pp)
        self.scratch = nn.Module()
        for i, ch in ((1, 256), (2, 512), (3, C), (4, C)):
            setattr(self.scratch, f"layer{i}_rn",
                    nn.Conv2d(ch, FEAT, 3, padding=1, bias=False))
        for i in range(1, 5):
            rf = nn.Module()
            for u in (1, 2):
                rcu = nn.Module()
                rcu.conv1 = nn.Conv2d(FEAT, FEAT, 3, padding=1, bias=True)
                rcu.conv2 = nn.Conv2d(FEAT, FEAT, 3, padding=1, bias=True)
                setattr(rf, f"resConfUnit{u}", rcu)
            rf.out_conv = nn.Conv2d(FEAT, FEAT, 1)
            setattr(self.scratch, f"refinenet{i}", rf)
        oc = nn.Module()
        oc.add_module("0", nn.Conv2d(FEAT, 16, 3, padding=1))
        oc.add_module("2", nn.Conv2d(16, 8, 3, padding=1))
        oc.add_module("4", nn.Conv2d(8, 1, 1))
        self.scratch.output_conv = oc

    @staticmethod
    def _rcu(rcu, x):
        h = rcu.conv1(F.relu(x))
        h = rcu.conv2(F.relu(h))
        return x + h

    def _fusion(self, rf, x, skip):
        if skip is not None:
            x = x + self._rcu(rf.resConfUnit1, skip)
        x = self._rcu(rf.resConfUnit2, x)
        x = F.interpolate(x, scale_factor=2, mode="bilinear",
                          align_corners=True)  # blocks.py:336
        return rf.out_conv(x)

    def forward(self, x):
        pm = self.pretrained.model
        backbone, taps = pm.patch_embed.backbone(x)
        b, _, gh, gw = backbone.shape
        tokens = pm.patch_embed.proj(backbone).flatten(2).transpose(1, 2)
        cls = pm.cls_token.expand(b, -1, -1)
        tokens = torch.cat([cls, tokens], dim=1) + pm.pos_embed
        hooked = []
        for i, blk in enumerate(pm.blocks):
            tokens = blk(tokens)
            if i in mh.HYBRID_HOOKS:
                hooked.append(tokens)
        feats = [self.scratch.layer1_rn(taps[0]),
                 self.scratch.layer2_rn(taps[1])]
        for i, tok in enumerate(hooked):
            pp = getattr(self.pretrained, f"act_postprocess{i + 3}")
            cls_t, patches = tok[:, :1], tok[:, 1:]
            cat = torch.cat([patches, cls_t.expand_as(patches)], dim=-1)
            y = F.gelu(getattr(pp, "0").project(cat))
            y = y.transpose(1, 2).reshape(b, C, gh, gw)
            y = getattr(pp, "3")(y)
            if i == 1:
                y = getattr(pp, "4")(y)
            rn = self.scratch.layer3_rn if i == 0 else self.scratch.layer4_rn
            feats.append(rn(y))
        l1, l2, l3, l4 = feats
        path = self._fusion(self.scratch.refinenet4, l4, None)
        path = self._fusion(self.scratch.refinenet3, path, l3)
        path = self._fusion(self.scratch.refinenet2, path, l2)
        path = self._fusion(self.scratch.refinenet1, path, l1)
        oc = self.scratch.output_conv
        y = getattr(oc, "0")(path)
        y = F.interpolate(y, scale_factor=2, mode="bilinear",
                          align_corners=True)  # dpt_depth.py:94
        y = F.relu(getattr(oc, "2")(y))
        y = F.relu(getattr(oc, "4")(y))
        return y[:, 0]


class TestDPTHybridMirror:
    @pytest.fixture(scope="class")
    def mirror(self):
        torch.manual_seed(0)
        return Mirror().eval()

    def test_state_dict_naming(self, mirror):
        sd = mirror.state_dict()
        for key in (
            "pretrained.model.patch_embed.backbone.stem.conv.weight",
            "pretrained.model.patch_embed.backbone.stages.0.blocks.0.norm1.weight",
            "pretrained.model.patch_embed.backbone.stages.0.blocks.0.downsample.conv.weight",
            "pretrained.model.patch_embed.proj.weight",
            "pretrained.model.cls_token",
            "pretrained.model.blocks.0.attn.qkv.weight",
            "pretrained.act_postprocess3.0.project.0.weight",
            "pretrained.act_postprocess4.4.weight",
            "scratch.layer1_rn.weight",
            "scratch.refinenet1.resConfUnit1.conv1.weight",
            "scratch.output_conv.0.weight",
        ):
            assert key in sd, key

    def test_full_parity(self, mirror, rng):
        sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
        params = mh.convert_dpt_hybrid(sd)
        x = rng.standard_normal((1, 64, 64, 3), dtype=np.float32) * 0.5
        with torch.no_grad():
            ref = mirror(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
        depth = np.asarray(mh.dpt_hybrid_apply(params, jnp.asarray(x)))
        assert depth.shape == (1, 64, 64)
        np.testing.assert_allclose(depth, ref, rtol=5e-3, atol=1e-3)
