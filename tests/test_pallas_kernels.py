"""Pallas kernel parity tests (interpret mode on CPU; compiled on TPU via
bench/verify runs). The analog of the reference's plugin-vs-pattern parity
implied by surgeon_graph fusion + engine checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.ops.norms import group_norm
from stablediffusioneo_tpu.ops.pallas.groupnorm import (
    fused_group_norm,
    group_norm_pallas_supported,
)

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier


class TestFusedGroupNorm:
    @pytest.mark.parametrize(
        "shape,groups",
        [
            ((2, 8, 8, 64), 8),
            ((1, 16, 12, 320), 32),  # SD channel count: C/G=10, misaligned
            ((1, 4, 4, 1280), 32),
        ],
    )
    @pytest.mark.parametrize("swish", [False, True])
    def test_vs_reference(self, rng, shape, groups, swish):
        x = rng.standard_normal(shape, dtype=np.float32)
        c = shape[-1]
        g = rng.standard_normal(c, dtype=np.float32)
        b = rng.standard_normal(c, dtype=np.float32)
        ref = np.asarray(
            group_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b), groups,
                       eps=1e-5, swish=swish)
        )
        out = np.asarray(
            fused_group_norm(
                jnp.asarray(x), jnp.asarray(g), jnp.asarray(b),
                groups=groups, eps=1e-5, swish=swish, interpret=True,
            )
        )
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_bf16(self, rng):
        x = rng.standard_normal((1, 8, 8, 64), dtype=np.float32)
        ref = np.asarray(
            group_norm(
                jnp.asarray(x, jnp.bfloat16), jnp.ones(64), jnp.zeros(64), 8,
                swish=True,
            ).astype(jnp.float32)
        )
        out = np.asarray(
            fused_group_norm(
                jnp.asarray(x, jnp.bfloat16), jnp.ones(64), jnp.zeros(64),
                groups=8, swish=True, interpret=True,
            ).astype(jnp.float32)
        )
        np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.05)

    def test_support_predicate(self):
        # dispatch claims slabs the single-read (fused or VMEM-resident)
        # kernels can hold; VAE-scale slabs stay on XLA (two-pass loses)
        assert group_norm_pallas_supported((1, 32, 32, 640), jnp.bfloat16, 32)
        assert group_norm_pallas_supported((1, 64, 64, 320), jnp.bfloat16, 32)
        assert not group_norm_pallas_supported((1, 512, 512, 128), jnp.bfloat16, 32)
        # channels not divisible by groups
        assert not group_norm_pallas_supported((1, 8, 8, 10), jnp.float32, 4)

    def test_two_pass_path(self, rng):
        """Shape large enough to force the chunked stats+normalize kernels."""
        x = rng.standard_normal((1, 64, 64, 320), dtype=np.float32)
        g = rng.standard_normal(320, dtype=np.float32)
        b = rng.standard_normal(320, dtype=np.float32)
        ref = np.asarray(
            group_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b), 32,
                       eps=1e-5, swish=True)
        )
        out = np.asarray(
            fused_group_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b),
                             groups=32, eps=1e-5, swish=True, interpret=True)
        )
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_dispatch_off_on_cpu(self, rng):
        """On CPU backend the dispatch must take the XLA path (no pallas)."""
        from stablediffusioneo_tpu.ops.dispatch import kernels_enabled

        assert not kernels_enabled("groupnorm")

    def test_interpret_carveout_runs_gn_and_int8_on_cpu(self, rng, monkeypatch):
        """SDEO_PALLAS_INTERPRET=1 admits ALL kernel families on non-TPU
        backends, so every family's call site must thread interpret through
        — combining it with SDEO_FORCE_GN_PALLAS / SDEO_INT8_PALLAS used to
        attempt real Mosaic lowering on CPU and crash (ADVICE r4 #1)."""
        from stablediffusioneo_tpu.ops import dispatch
        from stablediffusioneo_tpu.ops.norms import group_norm
        from stablediffusioneo_tpu.ops.pallas.quant import (
            quantize_weights, quantized_linear)

        monkeypatch.setenv("SDEO_PALLAS_INTERPRET", "1")
        monkeypatch.setattr(dispatch, "_FLAGS",
                            dict(dispatch._FLAGS,
                                 groupnorm=True, int8_linear=True))
        assert dispatch.kernels_enabled("groupnorm")
        x = rng.standard_normal((1, 8, 8, 64)).astype(np.float32)
        g = np.ones(64, np.float32)
        b = np.zeros(64, np.float32)
        out = group_norm(jnp.asarray(x, jnp.bfloat16), jnp.asarray(g),
                         jnp.asarray(b), groups=8)
        assert out.shape == x.shape
        q, s = quantize_weights(
            jnp.asarray(rng.standard_normal((256, 256)).astype(np.float32)))
        xx = jnp.asarray(rng.standard_normal((8, 256)).astype(np.float32))
        got = quantized_linear(xx, {"w_q": q, "scale": s})
        ref = xx @ (q.astype(jnp.float32) * s)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestQuantizedMatmul:
    def test_quantize_dequant_matmul(self, rng):
        from stablediffusioneo_tpu.ops.pallas.quant import (
            quantize_weights, quantized_matmul,
        )

        x = jnp.asarray(rng.standard_normal((16, 64), dtype=np.float32))
        w = jnp.asarray(rng.standard_normal((64, 256), dtype=np.float32) * 0.1)
        w_q, scales = quantize_weights(w)
        assert w_q.dtype == jnp.int8 and scales.shape == (1, 256)
        ref = np.asarray(x @ w)
        out = np.asarray(quantized_matmul(x, w_q, scales, block_n=128, interpret=True))
        rel = np.abs(out - ref).max() / np.abs(ref).max()
        assert rel < 0.02  # int8 per-channel quantization error budget


class TestFusedAttention:
    @pytest.mark.parametrize("shape,s", [((1, 2, 512, 40), 512), ((2, 2, 256, 80), 256)])
    def test_vs_reference(self, rng, shape, s):
        from stablediffusioneo_tpu.ops.attention import attention
        from stablediffusioneo_tpu.ops.pallas.attention import fused_attention

        b, h, tq, d = shape
        q = jnp.asarray(rng.standard_normal(shape, dtype=np.float32))
        k = jnp.asarray(rng.standard_normal((b, h, s, d), dtype=np.float32))
        v = jnp.asarray(rng.standard_normal((b, h, s, d), dtype=np.float32))
        ref = np.asarray(attention(q, k, v))
        out = np.asarray(fused_attention(q, k, v, d ** -0.5, interpret=True))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_support_predicate(self):
        from stablediffusioneo_tpu.ops.pallas.attention import fused_attention_supported

        assert fused_attention_supported((2, 8, 4096, 40), 4096, jnp.bfloat16)
        assert not fused_attention_supported((2, 8, 100, 40), 100, jnp.bfloat16)

    @pytest.mark.parametrize("b,h,t,s,d", [(2, 4, 256, 256, 40),
                                           (2, 8, 256, 77, 40),
                                           (1, 8, 128, 128, 80)])
    def test_packed_vs_reference(self, rng, b, h, t, s, d):
        """Head-packed kernel (heads sliced in-kernel, no caller transposes)
        vs the reference attention math."""
        from stablediffusioneo_tpu.ops.attention import attention
        from stablediffusioneo_tpu.ops.pallas.attention import (
            fused_attention_packed,
        )

        q = jnp.asarray(rng.standard_normal((b, t, h * d), dtype=np.float32))
        k = jnp.asarray(rng.standard_normal((b, s, h * d), dtype=np.float32))
        v = jnp.asarray(rng.standard_normal((b, s, h * d), dtype=np.float32))
        out = np.asarray(fused_attention_packed(q, k, v, h, scale=d ** -0.5,
                                                interpret=True))
        qh = jnp.transpose(q.reshape(b, t, h, d), (0, 2, 1, 3))
        kh = jnp.transpose(k.reshape(b, s, h, d), (0, 2, 1, 3))
        vh = jnp.transpose(v.reshape(b, s, h, d), (0, 2, 1, 3))
        ref = np.asarray(attention(qh, kh, vh))
        ref = np.transpose(ref, (0, 2, 1, 3)).reshape(b, t, h * d)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_attention_kernels_differentiable(self, rng):
        """The kernels carry a custom VJP (XLA-recompute backward) so
        training at flash-attention token counts traces; gradients must
        match the plain XLA attention path."""
        from stablediffusioneo_tpu.ops.pallas.attention import (
            fused_attention_packed,
        )

        b, h, t, s, d = 1, 4, 128, 128, 40
        q = jnp.asarray(rng.standard_normal((b, t, h * d), dtype=np.float32))
        k = jnp.asarray(rng.standard_normal((b, s, h * d), dtype=np.float32))
        v = jnp.asarray(rng.standard_normal((b, s, h * d), dtype=np.float32))
        co = jnp.asarray(rng.standard_normal((b, t, h * d), dtype=np.float32))

        def loss_kernel(q, k, v):
            return jnp.sum(fused_attention_packed(
                q, k, v, h, scale=d ** -0.5, interpret=True) * co)

        def loss_ref(q, k, v):
            from stablediffusioneo_tpu.ops.attention import attention

            qh = jnp.transpose(q.reshape(b, t, h, d), (0, 2, 1, 3))
            kh = jnp.transpose(k.reshape(b, s, h, d), (0, 2, 1, 3))
            vh = jnp.transpose(v.reshape(b, s, h, d), (0, 2, 1, 3))
            out = jnp.transpose(attention(qh, kh, vh), (0, 2, 1, 3))
            return jnp.sum(out.reshape(b, t, h * d) * co)

        gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a_, b_ in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                       rtol=1e-4, atol=1e-4)

    def test_chunked_backward_matches_naive(self, rng):
        """KV > _BWD_CHUNK_THRESHOLD routes the custom VJP through the
        chunked flash-style backward (no (Tq,Tk) buffer); its gradients
        must match the one-shot naive VJP."""
        from stablediffusioneo_tpu.ops.pallas import attention as pa

        b, h, t, s, d = 1, 2, 128, 2048, 16
        q = jnp.asarray(rng.standard_normal((b, t, h * d), dtype=np.float32))
        k = jnp.asarray(rng.standard_normal((b, s, h * d), dtype=np.float32))
        v = jnp.asarray(rng.standard_normal((b, s, h * d), dtype=np.float32))
        g = jnp.asarray(rng.standard_normal((b, t, h * d), dtype=np.float32))
        scale = d ** -0.5
        out = pa._packed_math(q, k, v, h, scale)
        assert s > pa._BWD_CHUNK_THRESHOLD and s % pa._BWD_CHUNK == 0
        dq, dk, dv = pa._packed_bwd(h, scale, True, False, (q, k, v, out), g)
        _, vjp = jax.vjp(lambda a, b_, c_: pa._packed_math(a, b_, c_, h,
                                                           scale), q, k, v)
        rq, rk, rv = vjp(g)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rq),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rk),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(rv),
                                   rtol=2e-4, atol=2e-4)

    def test_packed_support_predicate(self):
        from stablediffusioneo_tpu.ops.pallas.attention import (
            fused_attention_packed_supported,
        )

        # the SD-1.5 512px shapes: self-attn ds=1/2, cross-attn kv=77
        assert fused_attention_packed_supported((2, 4096, 320), 4096, 8, jnp.bfloat16)
        assert fused_attention_packed_supported((2, 4096, 320), 77, 8, jnp.bfloat16)
        assert fused_attention_packed_supported((2, 1024, 640), 1024, 8, jnp.bfloat16)
        assert not fused_attention_packed_supported((2, 100, 320), 100, 8, jnp.bfloat16)

    def test_packed_big_s_tier(self):
        """768^2 latents (S=9216, C=320): the K/V slab alone (11.8M) busts
        the standard 14M budget, but the bf16 big tier admits bq=128 under
        the raised scoped limit (measured 46.3 ms vs the split fallback's
        76.5 ms on v5e, bit-identical output). f32 at the same shape keeps
        the round-3 split fallback (the big tier is bf16-only), and 1024^2
        hires (S=16384, K/V 21M) stays out of the big tier too."""
        from stablediffusioneo_tpu.ops.pallas.attention import (
            _VMEM_BUDGET, _packed_working_set, _pick_block_q_packed,
            fused_attention_packed_supported,
        )

        assert _pick_block_q_packed(9216, 9216, 320, 8, 2) == 128
        assert fused_attention_packed_supported(
            (8, 9216, 320), 9216, 8, jnp.bfloat16)
        # the site is flagged oversize -> raised compiler limit at any batch
        assert _packed_working_set(128, 9216, 320, 2) > _VMEM_BUDGET
        # f32 is excluded from the big tier
        assert _pick_block_q_packed(9216, 9216, 320, 8, 4) == 0
        # 16384-token hires is beyond full-K/V capacity (goes to the
        # streaming kernel instead, below)
        assert _pick_block_q_packed(16384, 16384, 320, 2, 2) == 0
        # standard-budget shapes keep their existing picks
        assert _pick_block_q_packed(4096, 4096, 320, 2, 2) == 256
        assert _pick_block_q_packed(1024, 1024, 640, 2, 2) == 512

    def test_stream_picker_and_support(self):
        """1024² hires (S=16384, C=320): the full K/V slab (21M) cannot
        live in VMEM at any tier (Mosaic needed a >100M scoped limit of
        the chip's 128M), and the XLA fallback OOMs HBM outright (16G of
        fp32 logits at CFG batch-2). The K-blocked streaming kernel is
        the only viable path — measured 51 ms/call on v5e vs 146 ms for
        a chunked-XLA scan reference (the full-K/V form at a 110M limit
        ran 39 ms but leaves no VMEM for anything else)."""
        from stablediffusioneo_tpu.ops.pallas.attention import (
            _pick_blocks_stream, fused_attention_packed_supported,
        )

        blocks = _pick_blocks_stream(16384, 16384, 320, 2)
        assert blocks is not None and blocks[0] % 128 == 0 \
            and 16384 % blocks[1] == 0
        assert fused_attention_packed_supported(
            (2, 16384, 320), 16384, 8, jnp.bfloat16)
        # f32 (training VJP) never streams — unmeasured path
        assert _pick_blocks_stream(16384, 16384, 320, 4) is None
        # hires cross-attention (kv=77) still fits the full-K/V kernel
        assert fused_attention_packed_supported(
            (2, 16384, 320), 77, 8, jnp.bfloat16)

    def test_stream_interpret_parity(self):
        """Streaming (online-softmax) kernel vs the XLA reference math at
        a multi-block shape: the flash recurrence must be numerically
        equivalent to one-shot softmax within bf16 tolerance."""
        from stablediffusioneo_tpu.ops.pallas.attention import (
            _packed_math, _packed_stream_call,
        )

        B, T, C, H = 2, 384, 320, 8
        rng = np.random.default_rng(7)
        q = jnp.asarray(rng.standard_normal((B, T, C)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, T, C)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, T, C)), jnp.bfloat16)
        scale = (C // H) ** -0.5
        out = _packed_stream_call(q, k, v, H, scale, (128, 128),
                                  interpret=True)
        ref = _packed_math(q, k, v, H, scale)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        assert err < 0.05, err

    def test_block_picking_is_dtype_aware(self):
        """f32 inputs (training-path VJP recompute) must be budgeted at
        4 B/elem: the bf16 block choices stay identical, and the 384^2 f32
        training shape (tq=2304, C=320) remains supported (it compiles
        under the raised vmem limit — the round-3 fix that unblocked
        384^2 training)."""
        from stablediffusioneo_tpu.ops.pallas.attention import (
            _compiler_params, _pick_block_q, _pick_block_q_packed,
        )

        # measured bf16 flagship shapes keep their round-2 block sizes
        assert _pick_block_q_packed(4096, 4096, 320, 2, 2) == 256
        assert _pick_block_q(4096, 4096, 40, 2) == 512
        # f32 at the same shape budgets 2x the slab bytes
        assert _pick_block_q_packed(4096, 4096, 320, 2, 4) <= 256
        # the 384^2 training shape is supported in f32
        assert _pick_block_q_packed(2304, 2304, 320, 2, 4) > 0
        # f32 gets the raised scoped-vmem limit; measured bf16 does not
        assert _compiler_params(2, 40, 4) is not None
        assert _compiler_params(2, 40, 2) is None


class TestFusedLayerNorm:
    """ops/pallas/layernorm.py — single-read fused LN (SDXL's 233
    norm-stat launches/step, docs/xplane_sdxl.md)."""

    @pytest.mark.parametrize("shape", [(2, 4096, 640), (8, 1024, 1280),
                                       (2, 4096, 320)])
    def test_vs_reference(self, rng, shape):
        from stablediffusioneo_tpu.ops.pallas.layernorm import (
            fused_layer_norm,
            layer_norm_pallas_supported,
        )
        from stablediffusioneo_tpu.ops.norms import layer_norm

        c = shape[-1]
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        g = jnp.asarray(rng.standard_normal((c,)) * 0.1 + 1.0, jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.bfloat16)
        assert layer_norm_pallas_supported(shape, jnp.bfloat16)
        out = np.asarray(
            fused_layer_norm(x, g, b, eps=1e-5, interpret=True),
            np.float32)
        ref = np.asarray(layer_norm(x, g, b, 1e-5), np.float32)
        np.testing.assert_allclose(out, ref, atol=3e-2, rtol=3e-2)

    def test_support_predicate(self):
        from stablediffusioneo_tpu.ops.pallas.layernorm import (
            layer_norm_pallas_supported,
        )

        # tiny CLIP towers stay on XLA (launch overhead)
        assert not layer_norm_pallas_supported((2, 77, 768), jnp.bfloat16)
        # fp32 keeps the exact two-pass XLA form (parity tests pin it)
        assert not layer_norm_pallas_supported((2, 4096, 640), jnp.float32)
        # row counts that don't chunk by 8 stay on XLA
        assert not layer_norm_pallas_supported((1, 4095, 640), jnp.bfloat16)
        assert layer_norm_pallas_supported((2, 4096, 640), jnp.bfloat16)

    def test_differentiable(self, rng):
        """Training traces grad through layer_norm sites; the kernel's
        custom VJP (XLA-recompute backward) must match XLA's grads."""
        from stablediffusioneo_tpu.ops.pallas.layernorm import (
            fused_layer_norm,
        )
        from stablediffusioneo_tpu.ops.norms import layer_norm

        shape = (2, 2048, 320)
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        g = jnp.asarray(rng.standard_normal((320,)) * 0.1 + 1.0,
                        jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((320,)) * 0.1, jnp.bfloat16)
        co = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

        def loss_k(x_, g_, b_):
            return jnp.sum(
                fused_layer_norm(x_, g_, b_, eps=1e-5, interpret=True)
                .astype(jnp.float32) * co.astype(jnp.float32))

        def loss_r(x_, g_, b_):
            return jnp.sum(layer_norm(x_, g_, b_, 1e-5).astype(jnp.float32)
                           * co.astype(jnp.float32))

        gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, g, b)
        gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, g, b)
        for a, r in zip(gk, gr):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(r, np.float32),
                atol=0.15, rtol=0.15)

    def test_dispatch_spmd_gate(self, rng, monkeypatch):
        """Inside a mesh-engine (spmd) trace the LN kernel must NOT
        dispatch — it has no partitioning rule, so GSPMD would replicate
        dp/sp-sharded activations through it."""
        from stablediffusioneo_tpu.ops import dispatch
        from stablediffusioneo_tpu.ops.norms import layer_norm

        monkeypatch.setenv("SDEO_PALLAS_INTERPRET", "1")
        x = jnp.asarray(rng.standard_normal((2, 4096, 640)), jnp.bfloat16)
        g = jnp.ones((640,), jnp.bfloat16)
        b = jnp.zeros((640,), jnp.bfloat16)
        # force the (default-off, e2e-negative) kernel on so the spmd gate
        # is what decides the path
        dispatch.set_kernels(layernorm=True)
        try:
            with dispatch.spmd_attention_scope(True):
                out = layer_norm(x, g, b, 1e-5)  # must take the XLA path
        finally:
            dispatch.set_kernels(layernorm=False)
        ref = layer_norm(x, g, b, 1e-5)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=3e-2, rtol=3e-2)
