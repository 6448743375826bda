"""Spatial/sequence-parallel (sp) mesh axis (round 4).

sp shards the latent's H dim (NHWC) across chips and lets GSPMD propagate
it through the whole UNet: convs get halo exchanges (XLA spatial
partitioning), GroupNorm moments get cross-shard reductions, and the
flatten into transformer tokens carries the shard onto the token dim,
where the partition-aware Pallas attention keeps q sharded and gathers
only K/V. dp covers independent images (batch-1 CFG work fills only
dp=2), so sp is the single-image LATENCY axis — the remaining chips work
on one image's pixels.

(Reference analog: none — the reference is single-GPU. SURVEY.md §5
"distributed backend"; parallel/mesh.py module docstring.)
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from stablediffusioneo_tpu.config import tiny_pipeline
from stablediffusioneo_tpu.models import init_controlnet, init_unet
from stablediffusioneo_tpu.models.controlnet import controlled_unet_apply
from stablediffusioneo_tpu.parallel.mesh import (
    data_sharding,
    latent_sharding,
    make_mesh,
    shard_params,
)

CFG = tiny_pipeline()


class TestMeshConstruction:
    def test_sp1_keeps_two_axis_mesh(self):
        mesh = make_mesh(dp=4, tp=2)
        assert mesh.axis_names == ("dp", "tp")
        assert "sp" not in mesh.shape

    def test_sp_mesh_axes_and_order(self):
        mesh = make_mesh(dp=2, tp=2, sp=2)
        assert mesh.axis_names == ("dp", "sp", "tp")
        assert mesh.shape == {"dp": 2, "sp": 2, "tp": 2}

    def test_dp_inferred_with_sp(self):
        mesh = make_mesh(tp=2, sp=2)  # 8 devices -> dp=2
        assert mesh.shape["dp"] == 2

    def test_latent_sharding_specs(self):
        mesh = make_mesh(dp=2, tp=2, sp=2)
        assert latent_sharding(mesh, 4).spec == P("dp", "sp", None, None)
        assert latent_sharding(mesh, 1).spec == P("dp")
        flat = make_mesh(dp=4, tp=2)
        assert latent_sharding(flat, 4).spec == P("dp", None, None, None)


class TestSpPropagation:
    @pytest.mark.slow  # ~165 s: real-topology compile on the CPU mesh
    def test_sp_forward_parity_and_halos(self):
        """Full ControlNet+UNet forward on (dp=2, sp=2, tp=2): bitwise-
        close to the unsharded run, output keeps its (dp, sp) shard, and
        the program contains halo exchanges (collective-permutes from
        conv spatial partitioning)."""
        k1, k2, kx = jax.random.split(jax.random.PRNGKey(3), 3)
        unet_p = jax.jit(lambda k: init_unet(k, CFG.unet))(k1)
        ctrl_p = jax.jit(lambda k: init_controlnet(k, CFG.controlnet))(k2)
        b, hw, f = 2, 16, CFG.vae.downsample_factor
        x = jax.random.normal(kx, (b, hw, hw, 4), jnp.float32)
        hint = jax.random.uniform(kx, (b, hw * f, hw * f, 3), jnp.float32)
        t = jnp.full((b,), 500.0, jnp.float32)
        ctx = jax.random.normal(kx, (b, CFG.clip.max_length,
                                     CFG.unet.context_dim), jnp.float32)

        def fn(up, cp, x, hint, t, ctx):
            return controlled_unet_apply(up, cp, CFG.controlnet,
                                         x, hint, t, ctx)

        ref = np.asarray(jax.jit(fn)(unet_p, ctrl_p, x, hint, t, ctx))

        mesh = make_mesh(dp=2, tp=2, sp=2)
        up_s = shard_params(unet_p, mesh)
        cp_s = shard_params(ctrl_p, mesh)
        xs = jax.device_put(x, latent_sharding(mesh, 4))
        hs = jax.device_put(hint, latent_sharding(mesh, 4))
        ts = jax.device_put(t, data_sharding(mesh, 1))
        cs = jax.device_put(ctx, data_sharding(mesh, 3))
        with jax.set_mesh(mesh):
            compiled = jax.jit(fn).lower(up_s, cp_s, xs, hs, ts, cs).compile()
            out = compiled(up_s, cp_s, xs, hs, ts, cs)
        np.testing.assert_allclose(np.asarray(out), ref,
                                   rtol=2e-4, atol=2e-4)
        assert out.sharding.spec[:2] == ("dp", "sp"), out.sharding.spec
        txt = compiled.as_text()
        n_cp = len(re.findall(r"collective-permute(?:-start)?\(", txt))
        assert n_cp > 0, "no halo exchanges — sp shard did not propagate"


class TestRuntimeSpEngines:
    @pytest.fixture(scope="class")
    def pipes(self):
        from stablediffusioneo_tpu.models import init_clip_text, init_vae
        from stablediffusioneo_tpu.models.tokenizer import toy_tokenizer
        from stablediffusioneo_tpu.pipeline.canny2image import (
            Canny2ImagePipeline,
        )

        ks = jax.random.split(jax.random.PRNGKey(11), 4)
        params = {
            "unet": init_unet(ks[0], CFG.unet),
            "controlnet": init_controlnet(ks[1], CFG.controlnet),
            "vae": init_vae(ks[2], CFG.vae),
            "clip": init_clip_text(ks[3], CFG.clip),
        }
        params = jax.device_get(params)
        tok = toy_tokenizer(vocab_size=CFG.clip.vocab_size,
                            max_length=CFG.clip.max_length)
        mesh = make_mesh(dp=2, tp=2, sp=2)
        pipe_mesh = Canny2ImagePipeline(params, tok, CFG,
                                        persistent_cache=False, mesh=mesh)
        pipe_plain = Canny2ImagePipeline(params, tok, CFG,
                                         persistent_cache=False)
        return pipe_plain, pipe_mesh

    def test_io_sharding_selection(self):
        import types

        from stablediffusioneo_tpu.runtime.engine import CNSDRuntime

        # _io_sharding reads only self.mesh — no params/engines needed
        rt = types.SimpleNamespace(mesh=make_mesh(dp=2, tp=2, sp=2))
        sharding = CNSDRuntime._io_sharding
        assert sharding(rt, (2, 64, 64, 3), spatial=True).spec[:2] == (
            "dp", "sp")
        # sp keys on the call site's explicit spatial flag: a rank-4 input
        # NOT flagged spatial (e.g. windowed context (B, 3, 77, D)) must
        # stay dp-only rather than being silently sp-sharded on dim 1
        assert sharding(rt, (2, 3, 77, 768)).spec[1] is None
        # non-spatial / sp-indivisible inputs fall back to dp-only
        assert sharding(rt, (2, 77, 768)).spec == P("dp", None, None)
        assert sharding(rt, (2, 77, 768), spatial=True).spec[1] is None
        assert sharding(rt, (2, 63, 63, 3), spatial=True).spec[1] is None

    @pytest.mark.slow  # ~60 s: two pipelines' engines compile
    def test_process_sp_parity(self, pipes):
        """Full process() (clip -> fused sample+decode) over the
        (dp=2, sp=2, tp=2) mesh runtime matches the single-device
        pipeline on an identical seed + x_T."""
        pipe_plain, pipe_mesh = pipes
        rng = np.random.default_rng(5)
        src = np.zeros((64, 64, 3), np.uint8)
        src[16:48, 16:48] = 220
        f = CFG.vae.downsample_factor
        x_T = rng.standard_normal((2, 64 // f, 64 // f, 4)).astype(
            np.float32)
        outs = []
        for pipe in (pipe_plain, pipe_mesh):
            res = pipe.process(src, "a test", "", "", num_samples=2,
                               image_resolution=64, ddim_steps=2,
                               guess_mode=False, strength=1.0, scale=7.5,
                               seed=77, eta=0.0, low_threshold=100,
                               high_threshold=200, x_T=x_T)
            outs.append(np.stack(res[1:]).astype(np.int32))
        diff = np.abs(outs[0] - outs[1])
        # bf16 e2e: only shard-order reassociation wiggle allowed
        assert diff.mean() < 1.5 and (diff > 8).mean() < 0.01, (
            f"sp-mesh process diverged: mean {diff.mean():.3f}, "
            f"p99 {np.percentile(diff, 99)}")
