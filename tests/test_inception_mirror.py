"""Full-architecture torch mirror A/B for the FID InceptionV3 extractor.

The reference scores perceptual distance with pytorch_fid's InceptionV3
pool3 activations (/root/reference/compute_score.py:8-17). The canonical
pt_inception weights cannot be downloaded here (zero egress), so — like
every other converter in this repo — the JAX tower + converter are tested
against an INDEPENDENT torch mirror built from the published architecture
(torchvision inception_v3 through the global pool, with the pt_inception
FID quirks: count_include_pad=False average pools and a MAX pool in the
Mixed_7c branch_pool). The mirror's state_dict uses torchvision's exact
module naming, so `convert_inception`'s key handling, BN folding
(eps=1e-3), branch concat ORDER, and per-layer stride/padding are all
exercised end to end. A naming or topology misread fails here even though
both sides are builder-authored: the torch side computes through torch's
own Conv2d/BatchNorm2d/pool kernels, not through any shared code.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

pytestmark = pytest.mark.slow  # 299^2 inception forwards; excluded from fast tier


class BasicConv2d(nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg(x):
    # pt_inception FID flavor: count_include_pad=False
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class InceptionA(nn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(cin, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(_avg(x))
        return torch.cat([b1, b5, bd, bp], 1)


class InceptionB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = BasicConv2d(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([b3, bd, F.max_pool2d(x, 3, stride=2)], 1)


class InceptionC(nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                       padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1),
                                       padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(_avg(x))
        return torch.cat([b1, b7, bd, bp], 1)


class InceptionD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7),
                                         padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1),
                                         padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
            self.branch7x7x3_1(x))))
        return torch.cat([b3, b7, F.max_pool2d(x, 3, stride=2)], 1)


class InceptionE(nn.Module):
    def __init__(self, cin, pool: str):
        super().__init__()
        self.pool = pool
        self.branch1x1 = BasicConv2d(cin, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(cin, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                        padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                        padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                           padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                           padding=(1, 0))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        pooled = (F.max_pool2d(x, 3, stride=1, padding=1)
                  if self.pool == "max" else _avg(x))
        return torch.cat([b1, b3, bd, self.branch_pool(pooled)], 1)


class TorchFIDInception(nn.Module):
    """torchvision inception_v3 through the global pool, pt_inception FID
    pooling flavors (Mixed_7c = InceptionE_2: max branch_pool)."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = InceptionA(192, 32)
        self.Mixed_5c = InceptionA(256, 64)
        self.Mixed_5d = InceptionA(288, 64)
        self.Mixed_6a = InceptionB(288)
        self.Mixed_6b = InceptionC(768, 128)
        self.Mixed_6c = InceptionC(768, 160)
        self.Mixed_6d = InceptionC(768, 160)
        self.Mixed_6e = InceptionC(768, 192)
        self.Mixed_7a = InceptionD(768)
        self.Mixed_7b = InceptionE(1280, pool="avg")
        self.Mixed_7c = InceptionE(2048, pool="max")

    def forward(self, x):
        h = self.Conv2d_1a_3x3(x)
        h = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(h))
        h = F.max_pool2d(h, 3, stride=2)
        h = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(h))
        h = F.max_pool2d(h, 3, stride=2)
        for m in (self.Mixed_5b, self.Mixed_5c, self.Mixed_5d, self.Mixed_6a,
                  self.Mixed_6b, self.Mixed_6c, self.Mixed_6d, self.Mixed_6e,
                  self.Mixed_7a, self.Mixed_7b, self.Mixed_7c):
            h = m(h)
        return h.mean(dim=(2, 3))  # (N, 2048) pool3 features


def _randomized_bn_stats(model: torch.nn.Module, seed: int = 0):
    """Give every BN non-trivial running stats so folding is exercised."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
            m.running_var.copy_(
                torch.rand(m.num_features, generator=g) * 0.5 + 0.5)
            with torch.no_grad():
                m.weight.copy_(torch.rand(m.num_features, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.num_features, generator=g) * 0.1)


@pytest.fixture(scope="module")
def mirror():
    torch.manual_seed(0)
    m = TorchFIDInception().eval()
    _randomized_bn_stats(m)
    return m


class TestInceptionMirror:
    def test_features_match_torch(self, mirror):
        """Full 299^2 forward: JAX pool3 features == torch mirror."""
        from stablediffusioneo_tpu.scoring.inception import (
            convert_inception, inception_features,
        )

        sd = {k: v.numpy() for k, v in mirror.state_dict().items()}
        params = convert_inception(sd)
        rng = np.random.default_rng(0)
        x = rng.uniform(-1, 1, (1, 299, 299, 3)).astype(np.float32)
        with torch.no_grad():
            ref = mirror(torch.from_numpy(
                np.transpose(x, (0, 3, 1, 2)))).numpy()
        got = np.asarray(inception_features(params, jnp.asarray(x)))
        assert got.shape == ref.shape == (1, 2048)
        # fp32 + BN folding: tiny reassociation error only
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)

    def test_key_accounting_vs_mirror_universe(self, mirror):
        """convert_inception must consume the torch mirror's full key
        universe (conv + all 4 BN tensors per BasicConv2d; num_batches_
        tracked is a documented-ignored counter)."""
        from stablediffusioneo_tpu.checkpoint.accounting import account
        from stablediffusioneo_tpu.scoring.inception import convert_inception

        sd = {k: v.numpy() for k, v in mirror.state_dict().items()}
        # num_batches_tracked: BN's momentum counter — inference-irrelevant
        # (the synthetic universe in test_key_accounting omits it; a REAL
        # torchvision/pt_inception file carries it, which is why the mirror
        # exercises the documented-ignore path)
        rep = account(convert_inception, sd,
                      ignore=(r".*\.bn\.num_batches_tracked",))
        rep.assert_complete("inception")

    def test_extractor_distance_scale(self, mirror):
        """InceptionFeatureExtractor end-to-end (resize + [-1,1] scaling):
        identical images -> 0 distance; different images -> > 0."""
        from stablediffusioneo_tpu.scoring.inception import (
            InceptionFeatureExtractor, convert_inception,
        )

        sd = {k: v.numpy() for k, v in mirror.state_dict().items()}
        ext = InceptionFeatureExtractor(params=convert_inception(sd))
        rng = np.random.default_rng(1)
        a = (rng.random((256, 256, 3)) * 255).astype(np.uint8)
        b = (rng.random((256, 256, 3)) * 255).astype(np.uint8)
        fa, fb = ext(a), ext(b)
        assert np.linalg.norm(fa - ext(a)) == 0.0
        assert np.linalg.norm(fa - fb) > 0.0
