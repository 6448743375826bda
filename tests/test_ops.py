"""Parity tests for core ops vs torch-cpu reference math.

Mirrors the reference's module-level A/B strategy
(ldm/modules/test_mudules.py:174-200): same weights in both frameworks,
allclose with tight fp32 tolerances.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.ops import (
    attention,
    group_norm,
    group_norm_silu,
    layer_norm,
    multi_head_attention,
    timestep_embedding,
)
from stablediffusioneo_tpu.ops.layers import (
    avg_pool2d,
    conv2d,
    geglu,
    linear,
    upsample_nearest_2x,
)
from stablediffusioneo_tpu.ops.schedule import DiffusionSchedule, make_beta_schedule


def t2j(t):
    return jnp.asarray(t.detach().numpy())


class TestGroupNorm:
    @pytest.mark.parametrize("groups,c", [(32, 64), (8, 32), (4, 12)])
    def test_vs_torch(self, rng, groups, c):
        x = rng.standard_normal((2, 6, 5, c), dtype=np.float32)
        g = rng.standard_normal(c, dtype=np.float32)
        b = rng.standard_normal(c, dtype=np.float32)
        # torch GroupNorm is NCHW
        ref = F.group_norm(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            groups,
            torch.from_numpy(g),
            torch.from_numpy(b),
            eps=1e-5,
        ).permute(0, 2, 3, 1).numpy()
        out = np.asarray(group_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b), groups))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_silu_fusion(self, rng):
        x = rng.standard_normal((1, 4, 4, 32), dtype=np.float32)
        g = np.ones(32, np.float32)
        b = np.zeros(32, np.float32)
        base = group_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b), 8)
        fused = group_norm_silu(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b), 8)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(base * jax.nn.sigmoid(base)), rtol=1e-6, atol=1e-6
        )

    def test_bf16_stats_in_fp32(self, rng):
        # large-magnitude input would overflow bf16 variance if stats were bf16
        x = (rng.standard_normal((1, 8, 8, 32)) * 100).astype(np.float32)
        out_f32 = np.asarray(
            group_norm(jnp.asarray(x), jnp.ones(32), jnp.zeros(32), 8)
        )
        out_bf16 = np.asarray(
            group_norm(
                jnp.asarray(x, jnp.bfloat16), jnp.ones(32), jnp.zeros(32), 8
            ).astype(jnp.float32)
        )
        np.testing.assert_allclose(out_bf16, out_f32, rtol=0.05, atol=0.05)


class TestLayerNorm:
    def test_vs_torch(self, rng):
        x = rng.standard_normal((2, 7, 48), dtype=np.float32)
        g = rng.standard_normal(48, dtype=np.float32)
        b = rng.standard_normal(48, dtype=np.float32)
        ref = F.layer_norm(
            torch.from_numpy(x), (48,), torch.from_numpy(g), torch.from_numpy(b)
        ).numpy()
        out = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b)))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


class TestAttention:
    def test_sdpa_vs_torch(self, rng):
        q = rng.standard_normal((2, 4, 9, 16), dtype=np.float32)
        k = rng.standard_normal((2, 4, 7, 16), dtype=np.float32)
        v = rng.standard_normal((2, 4, 7, 16), dtype=np.float32)
        ref = F.scaled_dot_product_attention(
            torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)
        ).numpy()
        out = np.asarray(attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_mask(self, rng):
        q = rng.standard_normal((1, 1, 5, 8), dtype=np.float32)
        k = rng.standard_normal((1, 1, 5, 8), dtype=np.float32)
        v = rng.standard_normal((1, 1, 5, 8), dtype=np.float32)
        causal = np.triu(np.full((5, 5), -1e9, np.float32), k=1)
        ref = F.scaled_dot_product_attention(
            torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
            is_causal=True,
        ).numpy()
        out = np.asarray(
            attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mask=jnp.asarray(causal))
        )
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_mha_cross_vs_torch(self, rng):
        """Fused-QKV projection path == torch separate projections.

        The TPU analog of the reference's fused-weight export parity test
        (export_onnx_attention.py:181-216 / test_mudules.py:174-200)."""
        b_, tq, tk, c, ck, heads = 2, 6, 4, 32, 24, 4
        x = rng.standard_normal((b_, tq, c), dtype=np.float32)
        ctx = rng.standard_normal((b_, tk, ck), dtype=np.float32)
        wq = rng.standard_normal((c, c), dtype=np.float32) * 0.1
        wk = rng.standard_normal((ck, c), dtype=np.float32) * 0.1
        wv = rng.standard_normal((ck, c), dtype=np.float32) * 0.1
        wo = rng.standard_normal((c, c), dtype=np.float32) * 0.1
        bo = rng.standard_normal(c, dtype=np.float32)

        def torch_mha(x, ctx):
            q = torch.from_numpy(x) @ torch.from_numpy(wq)
            k = torch.from_numpy(ctx) @ torch.from_numpy(wk)
            v = torch.from_numpy(ctx) @ torch.from_numpy(wv)
            hd = c // heads
            q = q.view(b_, tq, heads, hd).transpose(1, 2)
            k = k.view(b_, tk, heads, hd).transpose(1, 2)
            v = v.view(b_, tk, heads, hd).transpose(1, 2)
            o = F.scaled_dot_product_attention(q, k, v)
            o = o.transpose(1, 2).reshape(b_, tq, c)
            return (o @ torch.from_numpy(wo) + torch.from_numpy(bo)).numpy()

        ref = torch_mha(x, ctx)
        out = np.asarray(
            multi_head_attention(
                jnp.asarray(x), jnp.asarray(ctx),
                jnp.asarray(wq), jnp.asarray(wk), jnp.asarray(wv),
                jnp.asarray(wo), jnp.asarray(bo), heads,
            )
        )
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
        # self-attention path (context=None) vs torch with ctx=x
        wk2 = rng.standard_normal((c, c), dtype=np.float32) * 0.1
        wv2 = rng.standard_normal((c, c), dtype=np.float32) * 0.1

        def torch_self(x):
            q = torch.from_numpy(x) @ torch.from_numpy(wq)
            k = torch.from_numpy(x) @ torch.from_numpy(wk2)
            v = torch.from_numpy(x) @ torch.from_numpy(wv2)
            hd = c // heads
            q = q.view(b_, tq, heads, hd).transpose(1, 2)
            k = k.view(b_, tq, heads, hd).transpose(1, 2)
            v = v.view(b_, tq, heads, hd).transpose(1, 2)
            o = F.scaled_dot_product_attention(q, k, v)
            o = o.transpose(1, 2).reshape(b_, tq, c)
            return (o @ torch.from_numpy(wo) + torch.from_numpy(bo)).numpy()

        out_self = np.asarray(
            multi_head_attention(
                jnp.asarray(x), None,
                jnp.asarray(wq), jnp.asarray(wk2), jnp.asarray(wv2),
                jnp.asarray(wo), jnp.asarray(bo), heads,
            )
        )
        np.testing.assert_allclose(out_self, torch_self(x), rtol=1e-4, atol=1e-5)


class TestLayers:
    def test_conv2d_vs_torch(self, rng):
        x = rng.standard_normal((2, 8, 8, 3), dtype=np.float32)
        w = rng.standard_normal((5, 5, 3, 7), dtype=np.float32)  # HWIO
        b = rng.standard_normal(7, dtype=np.float32)
        ref = F.conv2d(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(w).permute(3, 2, 0, 1),  # HWIO->OIHW
            torch.from_numpy(b),
            stride=2,
            padding=2,
        ).permute(0, 2, 3, 1).numpy()
        out = np.asarray(
            conv2d(jnp.asarray(x), {"w": jnp.asarray(w), "b": jnp.asarray(b)}, stride=2, padding=2)
        )
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_linear_vs_torch(self, rng):
        x = rng.standard_normal((3, 5), dtype=np.float32)
        w = rng.standard_normal((5, 4), dtype=np.float32)
        b = rng.standard_normal(4, dtype=np.float32)
        ref = (torch.from_numpy(x) @ torch.from_numpy(w) + torch.from_numpy(b)).numpy()
        out = np.asarray(linear(jnp.asarray(x), {"w": jnp.asarray(w), "b": jnp.asarray(b)}))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    def test_pool_and_upsample(self, rng):
        x = rng.standard_normal((1, 4, 4, 2), dtype=np.float32)
        ref_pool = F.avg_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 2).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(avg_pool2d(jnp.asarray(x))), ref_pool, rtol=1e-6)
        ref_up = F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2, mode="nearest"
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(
            np.asarray(upsample_nearest_2x(jnp.asarray(x))), ref_up, rtol=1e-6
        )

    def test_geglu_vs_torch(self, rng):
        x = rng.standard_normal((2, 3, 8), dtype=np.float32)
        w = rng.standard_normal((8, 12), dtype=np.float32)
        b = rng.standard_normal(12, dtype=np.float32)
        h = torch.from_numpy(x) @ torch.from_numpy(w) + torch.from_numpy(b)
        a, g = h.chunk(2, dim=-1)
        ref = (a * F.gelu(g)).numpy()
        out = np.asarray(geglu(jnp.asarray(x), {"w": jnp.asarray(w), "b": jnp.asarray(b)}))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


class TestSchedule:
    def test_beta_schedule_linear(self):
        betas = make_beta_schedule("linear", 1000, 0.00085, 0.0120)
        assert betas.shape == (1000,)
        np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-6)
        np.testing.assert_allclose(betas[-1], 0.0120, rtol=1e-6)
        # sqrt-linear: sqrt(beta) is linear
        d = np.diff(np.sqrt(betas))
        np.testing.assert_allclose(d, d[0], rtol=1e-6)

    def test_ddim_params(self):
        sched = DiffusionSchedule()
        dd = sched.ddim(20, eta=0.0)
        assert dd["timesteps"].shape == (20,)
        assert dd["timesteps"][0] > dd["timesteps"][-1]  # sampling order
        assert dd["timesteps"][-1] == 1  # +1 offset
        np.testing.assert_allclose(dd["sigmas"], 0.0)
        # alpha_prev of step i == alpha of step i+1 (reversed pairing)
        np.testing.assert_allclose(dd["alphas_prev"][:-1], dd["alphas"][1:], rtol=1e-6)

    def test_ddim_eta_sigma(self):
        sched = DiffusionSchedule()
        dd = sched.ddim(10, eta=1.0)
        assert (dd["sigmas"][:-1] > 0).all()

    def test_timestep_embedding_vs_torch(self):
        import math

        def torch_emb(timesteps, dim, max_period=10000):
            half = dim // 2
            freqs = torch.exp(
                -math.log(max_period)
                * torch.arange(start=0, end=half, dtype=torch.float32)
                / half
            )
            args = timesteps[:, None].float() * freqs[None]
            return torch.cat([torch.cos(args), torch.sin(args)], dim=-1).numpy()

        ts = np.array([0, 1, 500, 999], np.float32)
        ref = torch_emb(torch.from_numpy(ts), 320)
        out = np.asarray(timestep_embedding(jnp.asarray(ts), 320))
        # 1-ulp fp32 exp() difference (numpy vs torch libm) amplified by
        # t*freq at t=999 -> ~6e-5; genuinely at fp32 limits.
        np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


class TestUtils:
    def test_seed_and_count(self):
        from stablediffusioneo_tpu.utils import count_params, seed_everything

        key = seed_everything(42)
        assert key.shape == (2,)
        assert count_params({"a": np.zeros((3, 4)), "b": np.zeros(5)}) == 17

    def test_txt_as_img(self):
        from stablediffusioneo_tpu.utils import log_txt_as_img

        out = log_txt_as_img((128, 64), ["a bird", "another longer caption that wraps"])
        assert out.shape == (2, 64, 128, 3)
        assert out.min() < 255  # something was drawn

    def test_nan_guards(self):
        import jax.numpy as jnp

        from stablediffusioneo_tpu.utils import assert_finite, nan_report

        good = {"x": jnp.ones((2, 2))}
        assert nan_report(good) == []
        assert_finite(good)
        bad = {"x": jnp.asarray([1.0, np.nan])}
        assert nan_report(bad)
        with pytest.raises(AssertionError):
            assert_finite(bad, "bad")
