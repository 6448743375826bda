"""UniFormer-S + UperNet full-architecture torch mirror A/B test.

The converter (annotators/uniformer.py convert_uniformer_upernet) maps the
upstream `upernet_global_small.pth` mmseg naming; this mirror re-creates
that exact module tree in torch (backbone.patch_embed{1..4} / blocks{1..4}
with CBlock/SABlock internals, decode_head.psp_modules/.bottleneck/
.lateral_convs/.fpn_convs/.fpn_bottleneck/.conv_seg) and checks numeric
parity through the real key naming + BN folding — the strongest surrogate
without the real checkpoint (zero-egress).

Reference: annotator/uniformer/* (vendored mmseg) in the upstream repo;
public UniFormer repo for the backbone block structure.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

import stablediffusioneo_tpu.annotators.uniformer as uf

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier


class CBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.pos_embed = nn.Conv2d(dim, dim, 3, padding=1, groups=dim)
        self.norm1 = nn.BatchNorm2d(dim)
        self.conv1 = nn.Conv2d(dim, dim, 1)
        self.conv2 = nn.Conv2d(dim, dim, 1)
        self.attn = nn.Conv2d(dim, dim, 5, padding=2, groups=dim)
        self.norm2 = nn.BatchNorm2d(dim)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Conv2d(dim, 4 * dim, 1)
        self.mlp.fc2 = nn.Conv2d(4 * dim, dim, 1)

    def forward(self, x):
        x = x + self.pos_embed(x)
        x = x + self.conv2(self.attn(self.conv1(self.norm1(x))))
        x = x + self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
        return x


class SABlock(nn.Module):
    def __init__(self, dim, head_dim=64):
        super().__init__()
        self.pos_embed = nn.Conv2d(dim, dim, 3, padding=1, groups=dim)
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.attn.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, 4 * dim)
        self.mlp.fc2 = nn.Linear(4 * dim, dim)
        self.heads = dim // head_dim

    def forward(self, x):
        x = x + self.pos_embed(x)
        b, c, h, w = x.shape
        t = x.flatten(2).transpose(1, 2)  # (B, N, C)
        hh = self.norm1(t)
        qkv = self.attn.qkv(hh).reshape(b, h * w, 3, self.heads, c // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        att = (q @ k.transpose(-2, -1)) * (c // self.heads) ** -0.5
        att = att.softmax(dim=-1)
        o = (att @ v).transpose(1, 2).reshape(b, h * w, c)
        t = t + self.attn.proj(o)
        t = t + self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(t))))
        return t.transpose(1, 2).reshape(b, c, h, w)


class PatchEmbed(nn.Module):
    def __init__(self, cin, dim, k):
        super().__init__()
        self.proj = nn.Conv2d(cin, dim, k, stride=k)
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        x = self.proj(x)
        b, c, h, w = x.shape
        x = self.norm(x.flatten(2).transpose(1, 2))
        return x.transpose(1, 2).reshape(b, c, h, w)


class Backbone(nn.Module):
    def __init__(self):
        super().__init__()
        cin = 3
        for si, (depth, dim) in enumerate(zip(uf.DEPTHS, uf.DIMS)):
            setattr(self, f"patch_embed{si + 1}",
                    PatchEmbed(cin, dim, 4 if si == 0 else 2))
            blk = CBlock if si < 2 else SABlock
            setattr(self, f"blocks{si + 1}",
                    nn.ModuleList([blk(dim) for _ in range(depth)]))
            cin = dim

    def forward(self, x):
        feats = []
        for si in range(4):
            x = getattr(self, f"patch_embed{si + 1}")(x)
            for b in getattr(self, f"blocks{si + 1}"):
                x = b(x)
            feats.append(x)
        return feats


def conv_module(cin, cout, k, pad=0):
    m = nn.Module()
    m.conv = nn.Conv2d(cin, cout, k, padding=pad, bias=False)
    m.bn = nn.BatchNorm2d(cout)
    return m


def run_cm(m, x):
    return F.relu(m.bn(m.conv(x)))


class UperHead(nn.Module):
    def __init__(self, num_classes=uf.NUM_CLASSES):
        super().__init__()
        ch = uf.UPER_CH
        self.psp_modules = nn.ModuleList()
        for bins in (1, 2, 3, 6):
            seq = nn.ModuleList([nn.AdaptiveAvgPool2d(bins),
                                 conv_module(uf.DIMS[-1], ch, 1)])
            self.psp_modules.append(seq)
        self.bottleneck = conv_module(uf.DIMS[-1] + 4 * ch, ch, 3, pad=1)
        self.lateral_convs = nn.ModuleList(
            [conv_module(uf.DIMS[i], ch, 1) for i in range(3)])
        self.fpn_convs = nn.ModuleList(
            [conv_module(ch, ch, 3, pad=1) for _ in range(3)])
        self.fpn_bottleneck = conv_module(4 * ch, ch, 3, pad=1)
        self.conv_seg = nn.Conv2d(ch, num_classes, 1)

    def forward(self, feats):
        f4 = feats[3]
        pooled = [f4]
        for seq in self.psp_modules:
            g = run_cm(seq[1], seq[0](f4))
            pooled.append(F.interpolate(g, size=f4.shape[2:], mode="bilinear",
                                        align_corners=False))
        top = run_cm(self.bottleneck, torch.cat(pooled, dim=1))
        laterals = [run_cm(self.lateral_convs[i], feats[i])
                    for i in range(3)] + [top]
        for i in range(2, -1, -1):
            laterals[i] = laterals[i] + F.interpolate(
                laterals[i + 1], size=laterals[i].shape[2:], mode="bilinear",
                align_corners=False)
        outs = [run_cm(self.fpn_convs[i], laterals[i]) for i in range(3)] + [top]
        outs = [F.interpolate(o, size=outs[0].shape[2:], mode="bilinear",
                              align_corners=False) for o in outs]
        fused = run_cm(self.fpn_bottleneck, torch.cat(outs, dim=1))
        return self.conv_seg(fused)


class Segmentor(nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = Backbone()
        self.decode_head = UperHead()

    def forward(self, x):
        return self.decode_head(self.backbone(x))


class TestUniformerMirror:
    @pytest.fixture(scope="class")
    def mirror(self):
        torch.manual_seed(0)
        m = Segmentor().eval()
        with torch.no_grad():
            for mod in m.modules():
                if isinstance(mod, nn.BatchNorm2d):
                    mod.running_mean.uniform_(-0.2, 0.2)
                    mod.running_var.uniform_(0.7, 1.5)
        return m

    def test_state_dict_naming(self, mirror):
        sd = mirror.state_dict()
        for key in (
            "backbone.patch_embed1.proj.weight",
            "backbone.patch_embed1.norm.weight",
            "backbone.blocks1.0.pos_embed.weight",
            "backbone.blocks1.0.norm1.running_mean",
            "backbone.blocks3.0.attn.qkv.weight",
            "decode_head.psp_modules.0.1.conv.weight",
            "decode_head.psp_modules.0.1.bn.running_var",
            "decode_head.bottleneck.conv.weight",
            "decode_head.lateral_convs.0.conv.weight",
            "decode_head.fpn_convs.0.conv.weight",
            "decode_head.fpn_bottleneck.conv.weight",
            "decode_head.conv_seg.weight",
        ):
            assert key in sd, key

    def test_full_parity(self, mirror, rng):
        """Backbone + head numeric A/B through the converter (BN folding,
        qkv packing, depthwise layout) at full architecture.

        Input 224px so the deepest feature (7x7) exceeds every PPM bin
        count: the PPM resize is then always an UPSCALE, where
        jax.image.resize matches torch bilinear exactly. (Downscale
        semantics differ — jax anti-aliases — but never occur in real use:
        the detector's 512px inputs give a 16x16 deepest feature.)"""
        sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
        params = uf.convert_uniformer_upernet(sd)
        x = rng.standard_normal((1, 224, 224, 3), dtype=np.float32) * 0.5
        with torch.no_grad():
            ref = mirror(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
        feats = uf.uniformer_apply(params["backbone"], jnp.asarray(x))
        logits = np.asarray(uf.upernet_apply(params["decode_head"], feats))
        assert logits.shape == (1, 56, 56, uf.NUM_CLASSES)
        np.testing.assert_allclose(
            logits, np.transpose(ref, (0, 2, 3, 1)), rtol=5e-3, atol=1e-3)
