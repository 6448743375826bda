"""Multi-chip validation at REAL SD-1.5 width (VERDICT r2 item 2).

Three gates on the 8-device virtual CPU mesh (conftest.py):
  1. the flagship 512^2 sampler AOT-compiles at real width (320 ch, ctx 768)
     under dp=4 x tp=2, and its GSPMD program's collective census is sane:
     >= 2 psums per transformer block (Megatron attention-out + MLP-down),
     and ZERO all-gathers — i.e. no accidental full-param gathers;
  2. tp=2 sharded execution is numerically equal to unsharded execution at
     real width (small spatial shape);
  3. DiffusionServer runs over a mesh runtime end-to-end.

(Reference analog: the batch/stream concurrency layer,
cldm_trt/ddim_hacked.py:46-47 — here concurrency is GSPMD over ICI.)
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.config import (
    ControlNetConfig,
    UNetConfig,
    sd15_pipeline,
)
from stablediffusioneo_tpu.models import init_controlnet, init_unet
from stablediffusioneo_tpu.models.controlnet import controlled_unet_apply
from stablediffusioneo_tpu.models.unet import encoder_plan
from stablediffusioneo_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    shard_params,
    unet_param_sharding_rules,
)

pytestmark = pytest.mark.slow  # real-width CPU compiles take minutes


def _abs_sharded(shapes, mesh):
    rules = unet_param_sharding_rules(mesh, shapes)
    return jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        shapes, rules)


class TestRealWidthCollectiveCensus:
    def test_flagship_sampler_compiles_with_sane_collectives(self):
        """AOT-compile (no execution, no param materialization) the 512^2
        DDIM sampler scan at FULL SD-1.5 width on dp=4 x tp=2 and inspect
        the partitioned HLO."""
        from stablediffusioneo_tpu.ops.schedule import DiffusionSchedule
        from stablediffusioneo_tpu.pipeline.ddim import ddim_sample_scan

        cfg = sd15_pipeline(dtype="bfloat16")
        mesh = make_mesh(dp=4, tp=2)
        dt = jnp.bfloat16
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        shapes = {
            "unet": jax.eval_shape(lambda k: init_unet(k, cfg.unet), k1),
            "ctrl": jax.eval_shape(
                lambda k: init_controlnet(k, cfg.controlnet), k2),
        }
        shapes = jax.tree.map(
            lambda s: jax.ShapeDtypeStruct(
                s.shape, dt if s.dtype == jnp.float32 else s.dtype),
            shapes)
        abs_unet = _abs_sharded(shapes["unet"], mesh)
        abs_ctrl = _abs_sharded(shapes["ctrl"], mesh)

        B = 4  # dp shards of the CFG-batched sampler batch
        d = cfg.unet.context_dim
        lat = jax.ShapeDtypeStruct((B, 64, 64, 4), dt,
                                   sharding=data_sharding(mesh, 4))
        hint = jax.ShapeDtypeStruct((B, 512, 512, 3), dt,
                                    sharding=data_sharding(mesh, 4))
        ctx = jax.ShapeDtypeStruct((B, 77, d), dt,
                                   sharding=data_sharding(mesh, 3))
        scale = jax.ShapeDtypeStruct((B,), jnp.float32,
                                     sharding=data_sharding(mesh, 1))
        n_taps = len(encoder_plan(cfg.unet)) + 1
        cscales = jax.ShapeDtypeStruct((n_taps,), jnp.float32)
        key = jax.ShapeDtypeStruct((2,), jnp.uint32)

        d_sched = DiffusionSchedule(
            cfg.diffusion.timesteps, cfg.diffusion.linear_start,
            cfg.diffusion.linear_end, cfg.diffusion.schedule).ddim(2)
        sched_abs = {k: jax.ShapeDtypeStruct(v.shape, v.dtype)
                     for k, v in d_sched.items()}

        def fn(unet_p, ctrl_p, sched, x_T, hint, ctx_c, ctx_u, sc, cs, k):
            return ddim_sample_scan(unet_p, ctrl_p, cfg.controlnet, sched,
                                    x_T, hint, ctx_c, ctx_u, sc, cs, k)

        compiled = jax.jit(fn).lower(
            abs_unet, abs_ctrl, sched_abs, lat, hint, ctx, ctx,
            scale, cscales, key).compile()
        txt = compiled.as_text()

        n_ar = len(re.findall(r"all-reduce(?:-start)?\(", txt))
        # transformer blocks carrying TP linears: UNet 16 (6 enc + 1 mid +
        # 9 dec) + ControlNet 7 (6 enc + 1 mid) = 23; Megatron gives >= 2
        # psums each (attention wo + ff2) inside the scan body
        n_blocks = 23
        assert n_ar >= 2 * n_blocks, (
            f"only {n_ar} all-reduces in the partitioned sampler "
            f"(expected >= {2 * n_blocks}) — TP shardings not propagating")
        # no LARGE all-gathers (a full-param or activation-slab gather is a
        # layout bug; tiny ones like the f32[4] per-sample-scale gather in
        # the scan body are fine)
        for m in re.finditer(
                r"=\s*(\w+)\[([\d,]*)\][^=]*all-gather(?:-start)?\(", txt):
            dtype_s, dims = m.group(1), m.group(2)
            n_elems = np.prod([int(x) for x in dims.split(",") if x] or [1])
            itemsize = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4,
                        "u32": 4, "pred": 1}.get(dtype_s, 4)
            assert n_elems * itemsize < 1 << 20, (
                f"large all-gather in sampler: {m.group(0)[:120]}")

    def test_memory_analysis_shards_params(self):
        """The compiled per-device program must NOT hold the full replicated
        param set: argument bytes per device < total param bytes (tp shards
        the big linears)."""
        cfg = sd15_pipeline(dtype="bfloat16")
        mesh = make_mesh(dp=4, tp=2)
        dt = jnp.bfloat16
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        shapes = {
            "unet": jax.eval_shape(lambda k: init_unet(k, cfg.unet), k1),
            "ctrl": jax.eval_shape(
                lambda k: init_controlnet(k, cfg.controlnet), k2),
        }
        shapes = jax.tree.map(
            lambda s: jax.ShapeDtypeStruct(
                s.shape, dt if s.dtype == jnp.float32 else s.dtype),
            shapes)
        total = sum(int(np.prod(s.shape)) * s.dtype.itemsize
                    for s in jax.tree.leaves(shapes))
        abs_unet = _abs_sharded(shapes["unet"], mesh)
        abs_ctrl = _abs_sharded(shapes["ctrl"], mesh)
        B, d = 4, cfg.unet.context_dim
        lat = jax.ShapeDtypeStruct((B, 32, 32, 4), dt,
                                   sharding=data_sharding(mesh, 4))
        hint = jax.ShapeDtypeStruct((B, 256, 256, 3), dt,
                                    sharding=data_sharding(mesh, 4))
        t = jax.ShapeDtypeStruct((B,), jnp.float32,
                                 sharding=data_sharding(mesh, 1))
        ctx = jax.ShapeDtypeStruct((B, 77, d), dt,
                                   sharding=data_sharding(mesh, 3))

        def fn(unet_p, ctrl_p, x, hint, t, ctx):
            return controlled_unet_apply(
                unet_p, ctrl_p, cfg.controlnet, x, hint, t, ctx)

        compiled = jax.jit(fn).lower(
            abs_unet, abs_ctrl, lat, hint, t, ctx).compile()
        mem = compiled.memory_analysis()
        arg_bytes = getattr(mem, "argument_size_in_bytes", None)
        if arg_bytes:  # backend-dependent introspection
            assert arg_bytes < total, (
                f"per-device args {arg_bytes/1e6:.0f} MB >= total params "
                f"{total/1e6:.0f} MB: tp sharding saved nothing")


class TestRealWidthTPParity:
    def test_tp2_matches_unsharded(self):
        """tp=2 sharded vs single-device execution at real SD-1.5 width
        (f32, latent 16x16): Megatron partitioning must be numerics-
        preserving up to psum reassociation."""
        cfg = sd15_pipeline()  # f32
        ucfg = cfg.unet
        assert ucfg.model_channels == 320 and ucfg.context_dim == 768
        ccfg = ControlNetConfig(unet=ucfg)
        k1, k2, kx = jax.random.split(jax.random.PRNGKey(3), 3)
        unet_p = jax.jit(lambda k: init_unet(k, ucfg))(k1)
        ctrl_p = jax.jit(lambda k: init_controlnet(k, ccfg))(k2)
        B = 2
        x = jax.random.normal(kx, (B, 16, 16, 4), jnp.float32)
        hint = jax.random.uniform(kx, (B, 128, 128, 3), jnp.float32)
        t = jnp.full((B,), 500.0, jnp.float32)
        ctx = jax.random.normal(kx, (B, 77, ucfg.context_dim), jnp.float32)

        def fn(up, cp, x, hint, t, ctx):
            return controlled_unet_apply(up, cp, ccfg, x, hint, t, ctx)

        ref = np.asarray(jax.jit(fn)(unet_p, ctrl_p, x, hint, t, ctx))

        mesh = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
        up_s = shard_params(unet_p, mesh)
        cp_s = shard_params(ctrl_p, mesh)
        xs = jax.device_put(x, data_sharding(mesh, 4))
        hs = jax.device_put(hint, data_sharding(mesh, 4))
        ts = jax.device_put(t, data_sharding(mesh, 1))
        cs = jax.device_put(ctx, data_sharding(mesh, 3))
        out = np.asarray(jax.jit(fn)(up_s, cp_s, xs, hs, ts, cs))
        # psum reassociation only: tight f32 tolerance
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


class TestServingOnMesh:
    def test_diffusion_server_over_mesh_runtime(self):
        """DiffusionServer end-to-end on a dp=2 x tp=2 mesh runtime: burst
        batches cut, dispatch through mesh engines, outputs sane."""
        from stablediffusioneo_tpu.config import tiny_pipeline
        from stablediffusioneo_tpu.models import init_clip_text, init_vae
        from stablediffusioneo_tpu.models.tokenizer import toy_tokenizer
        from stablediffusioneo_tpu.pipeline.canny2image import (
            Canny2ImagePipeline,
        )
        from stablediffusioneo_tpu.serving import DiffusionServer, GenRequest

        cfg = tiny_pipeline()
        ks = jax.random.split(jax.random.PRNGKey(7), 4)
        params = {
            "unet": init_unet(ks[0], cfg.unet),
            "controlnet": init_controlnet(ks[1], cfg.controlnet),
            "vae": init_vae(ks[2], cfg.vae),
            "clip": init_clip_text(ks[3], cfg.clip),
        }
        tok = toy_tokenizer(vocab_size=cfg.clip.vocab_size,
                            max_length=cfg.clip.max_length)
        mesh = make_mesh(dp=2, tp=2, devices=jax.devices()[:4])
        pipe = Canny2ImagePipeline(params, tok, cfg, persistent_cache=False,
                                   mesh=mesh)
        server = DiffusionServer(pipe, batch_buckets=(1, 2, 4),
                                 max_wait_ms=200.0).start()
        try:
            rng = np.random.default_rng(0)

            def mk(i):
                return GenRequest(
                    image=(rng.random((64, 64, 3)) * 255).astype(np.uint8),
                    prompt=f"prompt {i}", image_resolution=64, ddim_steps=2,
                    seed=100 + i, scale=7.0 + i)

            futures = [server.submit(mk(i)) for i in range(4)]
            outs = [f.result(timeout=900) for f in futures]
            for det, im in outs:
                assert im.shape == (64, 64, 3) and im.dtype == np.uint8
                assert det.shape[:2] == (64, 64)
            st = server.stats.snapshot()
            assert st["requests"] == 4
            assert st["batches"] < 4, f"no batching on mesh: {st}"
            # distinct seeds must produce distinct images
            assert not np.array_equal(outs[0][1], outs[1][1])
            # lone request exercises the non-dp-divisible batch-1 path
            det, im = server.generate(mk(99), timeout=900)
            assert im.shape == (64, 64, 3)
        finally:
            server.stop(drain=False)
