"""Partition-aware Pallas attention under a device mesh (round 4).

pl.pallas_call lowers to an opaque custom call: without a partitioning
rule GSPMD/shardy must replicate its operands, which on a real multi-chip
mesh would all-gather q/k/v around every attention site and undo the
Megatron TP sharding of the qkv projections (parallel/mesh.py). The
custom_partitioning wrappers (ops/pallas/attention.py) teach the
partitioner the kernel's algebra: batch shards over dp, heads over tp
(the packed kernel's channel dim IS a head slice), query tokens over sp;
the K/V sequence is gathered per the attention math.

All tests run the REAL kernel code path in Pallas interpret mode on the
8-device virtual CPU mesh (conftest.py) and compare against the
single-device XLA math reference.

(Reference analog: none — the reference is single-GPU. This is the TPU
rebuild's ICI scaling story applied to its custom kernels, SURVEY.md §5
"distributed backend".)
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from stablediffusioneo_tpu.ops.pallas.attention import (
    _packed_math,
    _split_math,
    fused_attention,
    fused_attention_packed,
)
from stablediffusioneo_tpu.parallel.mesh import make_mesh


def _mk(rng, shape, dtype=np.float32):
    return jnp.asarray(rng.standard_normal(shape), dtype)


def _put(mesh, spec, *arrs):
    sh = NamedSharding(mesh, spec)
    return tuple(jax.device_put(a, sh) for a in arrs)


class TestPackedPartitioned:
    def test_dp_tp_parity_and_sharding_preserved(self, rng):
        b, tq, c, h = 4, 256, 64, 4
        q, k, v = (_mk(rng, (b, tq, c)) for _ in range(3))
        ref = _packed_math(q, k, v, h, (c // h) ** -0.5)
        mesh = make_mesh(dp=4, tp=2)
        qs, ks, vs = _put(mesh, P("dp", None, "tp"), q, k, v)
        with jax.set_mesh(mesh):
            out = jax.jit(
                lambda a, b_, c_: fused_attention_packed(
                    a, b_, c_, h, (c // h) ** -0.5,
                    interpret=True, spmd=True)
            )(qs, ks, vs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
        # heads stay tp-sharded and batch dp-sharded on the way OUT — the
        # whole point: no replication forced around the kernel
        assert out.sharding.spec == P("dp", None, "tp")

    def test_sp_token_sharding_gathers_only_kv(self, rng):
        """q/k/v sharded on the token dim (sp): the partitioner must
        all-gather K and V over sp (every q row attends over all keys) and
        NOTHING else — q tiles stay sharded."""
        b, tq, c, h = 2, 512, 64, 4
        q, k, v = (_mk(rng, (b, tq, c)) for _ in range(3))
        ref = _packed_math(q, k, v, h, (c // h) ** -0.5)
        mesh = make_mesh(dp=2, tp=2)
        # shard tokens over the tp axis here (axis name is irrelevant to
        # the kernel; this is the sequence-parallel layout)
        qs, ks, vs = _put(mesh, P("dp", "tp", None), q, k, v)
        with jax.set_mesh(mesh):
            f = jax.jit(
                lambda a, b_, c_: fused_attention_packed(
                    a, b_, c_, h, (c // h) ** -0.5,
                    interpret=True, spmd=True))
            compiled = f.lower(qs, ks, vs).compile()
            out = compiled(qs, ks, vs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
        assert out.sharding.spec == P("dp", "tp", None)
        # census: every all-gather in the program is a K/V slab gather
        # (per-shard (1, tq, c) f32 = tq*c*4 bytes); a q gather would be
        # the same size but there must be exactly the K and V gathers
        txt = compiled.as_text()
        gathers = re.findall(r"all-gather\(", txt)
        assert len(gathers) <= 2, f"{len(gathers)} all-gathers (want <=2 " \
                                  f"— K and V only):\n" + txt[:2000]

    def test_degrade_indivisible_heads_stays_correct(self, rng):
        """tp=2 channel sharding with heads=3: shard would split a head —
        the partition callback must degrade to replicated channels and
        still produce exact results."""
        b, tq, c, h = 2, 256, 48, 3
        q, k, v = (_mk(rng, (b, tq, c)) for _ in range(3))
        ref = _packed_math(q, k, v, h, (c // h) ** -0.5)
        mesh = make_mesh(dp=4, tp=2)
        qs, ks, vs = _put(mesh, P(None, None, "tp"), q, k, v)
        with jax.set_mesh(mesh):
            out = jax.jit(
                lambda a, b_, c_: fused_attention_packed(
                    a, b_, c_, h, (c // h) ** -0.5,
                    interpret=True, spmd=True)
            )(qs, ks, vs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_degrade_small_token_shards(self, rng):
        """tq=128 sharded over 2: per-shard 64 tokens breaks the kernel's
        128-alignment — must unshard tokens, not fail."""
        b, tq, c, h = 8, 128, 64, 4
        q, k, v = (_mk(rng, (b, tq, c)) for _ in range(3))
        ref = _packed_math(q, k, v, h, (c // h) ** -0.5)
        mesh = make_mesh(dp=4, tp=2)
        qs, ks, vs = _put(mesh, P("dp", "tp", None), q, k, v)
        with jax.set_mesh(mesh):
            out = jax.jit(
                lambda a, b_, c_: fused_attention_packed(
                    a, b_, c_, h, (c // h) ** -0.5,
                    interpret=True, spmd=True)
            )(qs, ks, vs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_cross_attention_short_kv(self, rng):
        """Cross-attention (kv_len 77-style, here 128): K/V sequence differs
        from tq; batch+head sharding still partitions."""
        b, tq, s, c, h = 4, 256, 128, 64, 4
        q = _mk(rng, (b, tq, c))
        k, v = (_mk(rng, (b, s, c)) for _ in range(2))
        ref = _packed_math(q, k, v, h, (c // h) ** -0.5)
        mesh = make_mesh(dp=4, tp=2)
        (qs,) = _put(mesh, P("dp", None, "tp"), q)
        ks, vs = _put(mesh, P("dp", None, "tp"), k, v)
        with jax.set_mesh(mesh):
            out = jax.jit(
                lambda a, b_, c_: fused_attention_packed(
                    a, b_, c_, h, (c // h) ** -0.5,
                    interpret=True, spmd=True)
            )(qs, ks, vs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_grad_through_partitioned_forward(self, rng):
        """The custom VJP's backward is XLA math (natively partitioned);
        grads must flow and match the unsharded gradient."""
        b, tq, c, h = 2, 256, 64, 4
        q, k, v = (_mk(rng, (b, tq, c)) for _ in range(3))

        def loss(spmd):
            def f(a, b_, c_):
                return jnp.sum(fused_attention_packed(
                    a, b_, c_, h, (c // h) ** -0.5,
                    interpret=True, spmd=spmd) ** 2)
            return f

        g_ref = jax.grad(loss(False))(q, k, v)
        mesh = make_mesh(dp=2, tp=2)
        qs, ks, vs = _put(mesh, P("dp", None, "tp"), q, k, v)
        with jax.set_mesh(mesh):
            g = jax.jit(jax.grad(loss(True)))(qs, ks, vs)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   atol=5e-5, rtol=5e-5)


class TestSplitPartitioned:
    def test_dp_tp_parity(self, rng):
        b, h, tq, d = 4, 4, 256, 16
        q, k, v = (_mk(rng, (b, h, tq, d)) for _ in range(3))
        ref = _split_math(q, k, v, d ** -0.5)
        mesh = make_mesh(dp=4, tp=2)
        qs, ks, vs = _put(mesh, P("dp", "tp", None, None), q, k, v)
        with jax.set_mesh(mesh):
            out = jax.jit(
                lambda a, b_, c_: fused_attention(
                    a, b_, c_, d ** -0.5, interpret=True, spmd=True)
            )(qs, ks, vs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
        assert out.sharding.spec == P("dp", "tp", None, None)

    def test_token_sharding_parity(self, rng):
        b, h, tq, d = 2, 2, 512, 16
        q, k, v = (_mk(rng, (b, h, tq, d)) for _ in range(3))
        ref = _split_math(q, k, v, d ** -0.5)
        mesh = make_mesh(dp=2, tp=2)
        # tokens sharded over dp, heads over tp
        qs, ks, vs = _put(mesh, P(None, "tp", "dp", None), q, k, v)
        with jax.set_mesh(mesh):
            out = jax.jit(
                lambda a, b_, c_: fused_attention(
                    a, b_, c_, d ** -0.5, interpret=True, spmd=True)
            )(qs, ks, vs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


class TestDispatchPlumbing:
    def test_scope_enables_flag_during_trace(self):
        from stablediffusioneo_tpu.ops.dispatch import (
            spmd_attention_scope,
            spmd_partitioning_enabled,
        )

        assert not spmd_partitioning_enabled()
        seen = {}

        def fn(x):
            seen["in_scope"] = spmd_partitioning_enabled()
            return x * 2

        from stablediffusioneo_tpu.runtime.engine import _spmd_traced

        jax.jit(_spmd_traced(fn))(jnp.ones((2,)))
        assert seen["in_scope"] is True
        assert not spmd_partitioning_enabled()
        with spmd_attention_scope(False):
            assert not spmd_partitioning_enabled()

    def test_single_device_spmd_flag_is_safe(self, rng):
        """spmd=True without any mesh/sharded inputs must still be correct
        (someone sets SDEO_SPMD_ATTN=1 globally on one chip)."""
        b, tq, c, h = 2, 256, 64, 4
        q, k, v = (_mk(rng, (b, tq, c)) for _ in range(3))
        ref = _packed_math(q, k, v, h, (c // h) ** -0.5)
        out = jax.jit(
            lambda a, b_, c_: fused_attention_packed(
                a, b_, c_, h, (c // h) ** -0.5, interpret=True, spmd=True)
        )(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_model_layer_dispatches_under_interpret_env(self, rng,
                                                        monkeypatch):
        """End-to-end plumbing: with SDEO_PALLAS_INTERPRET=1 the model
        layer's multi_head_attention dispatches to the packed kernel on
        CPU, in interpret mode, under a mesh with TP-sharded projection
        weights — the full mesh-engine code path minus the TPU."""
        monkeypatch.setenv("SDEO_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("SDEO_ATTN_MIN_TQ", "128")
        from stablediffusioneo_tpu.ops.attention import multi_head_attention
        from stablediffusioneo_tpu.ops.dispatch import spmd_attention_scope

        b, tq, c, h = 2, 256, 64, 4
        x = _mk(rng, (b, tq, c))
        wq, wk, wv, wo = (_mk(rng, (c, c)) * 0.1 for _ in range(4))
        bo = _mk(rng, (c,)) * 0.1

        ref = multi_head_attention(x, None, wq, wk, wv, wo, bo, h)

        mesh = make_mesh(dp=2, tp=2)
        xs = jax.device_put(x, NamedSharding(mesh, P("dp", None, None)))
        col = NamedSharding(mesh, P(None, "tp"))
        row = NamedSharding(mesh, P("tp", None))
        wqs, wks, wvs = (jax.device_put(w, col) for w in (wq, wk, wv))
        wos = jax.device_put(wo, row)
        bos = jax.device_put(bo, NamedSharding(mesh, P(None)))

        def fn(x, wq, wk, wv, wo, bo):
            with spmd_attention_scope(True):
                return multi_head_attention(x, None, wq, wk, wv, wo, bo, h)

        with jax.set_mesh(mesh):
            out = jax.jit(fn)(xs, wqs, wks, wvs, wos, bos)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)
