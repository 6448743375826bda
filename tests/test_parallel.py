"""Mesh/sharding tests on the 8-virtual-device CPU mesh: dp-sharded
inference equals unsharded; tp-sharded params produce the same outputs;
train step runs sharded (the dryrun path, in-suite)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from stablediffusioneo_tpu.config import tiny_pipeline
from stablediffusioneo_tpu.models import init_controlnet, init_unet
from stablediffusioneo_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    shard_params,
)

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier

CFG = tiny_pipeline()


@pytest.fixture(scope="module")
def mesh_and_params():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(dp=4, tp=2)
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    up = init_unet(ks[0], CFG.unet)
    cp = init_controlnet(ks[1], CFG.controlnet)
    return mesh, up, cp


class TestShardedInference:
    def test_dp_tp_sampler_matches_unsharded(self, rng, mesh_and_params):
        from stablediffusioneo_tpu.pipeline.ddim import ddim_sample_scan
        from stablediffusioneo_tpu.ops.schedule import DiffusionSchedule

        mesh, up, cp = mesh_and_params
        sched = DiffusionSchedule().ddim(2)
        b = 4
        x_T = rng.standard_normal((b, 8, 8, 4), dtype=np.float32)
        hint = rng.random((b, 64, 64, 3), dtype=np.float32)
        ctx = rng.standard_normal((b, 5, CFG.unet.context_dim), dtype=np.float32)
        args = dict(
            scale=jnp.asarray(9.0), key=jax.random.PRNGKey(0),
            control_scales=jnp.ones(5, jnp.float32),
        )

        ref = np.asarray(
            ddim_sample_scan(
                up, cp, CFG.controlnet, sched, jnp.asarray(x_T),
                jnp.asarray(hint), jnp.asarray(ctx), jnp.asarray(ctx), **args,
            )
        )

        up_s = shard_params(up, mesh)
        cp_s = shard_params(cp, mesh)
        with mesh:
            out = ddim_sample_scan(
                up_s, cp_s, CFG.controlnet, sched,
                jax.device_put(x_T, data_sharding(mesh, 4)),
                jax.device_put(hint, data_sharding(mesh, 4)),
                jax.device_put(ctx, data_sharding(mesh, 3)),
                jax.device_put(ctx, data_sharding(mesh, 3)),
                **args,
            )
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)

    def test_tp_param_shardings_applied(self, mesh_and_params):
        mesh, up, _ = mesh_and_params
        up_s = shard_params(up, mesh)
        # an attention projection must be tp-sharded...
        blk = next(b for b in up_s["input_blocks"] if "attn" in b)
        wq = blk["attn"]["blocks"][0]["attn1"]["wq"]["w"]
        assert wq.sharding.spec == P(None, "tp")
        # ...and conv kernels replicated
        conv = up_s["input_blocks"][0]["conv"]["w"]
        assert conv.sharding.spec in (P(), P(None, None, None, None))


class TestRemat:
    def test_train_step_with_remat(self, rng, mesh_and_params):
        """Gradients identical with rematerialization on."""
        from stablediffusioneo_tpu.ops.dispatch import set_kernels
        from stablediffusioneo_tpu.training.trainer import (
            diffusion_loss, make_schedule_buffers,
        )

        _, up, cp = mesh_and_params
        sqrt_a, sqrt_1ma = make_schedule_buffers(CFG)
        batch = {
            "x0": jnp.asarray(rng.standard_normal((2, 8, 8, 4), dtype=np.float32)),
            "hint": jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32)),
            "ctx": jnp.asarray(rng.standard_normal((2, 5, CFG.unet.context_dim), dtype=np.float32)),
        }
        t = jnp.asarray([100, 700], jnp.int32)
        noise = jnp.asarray(rng.standard_normal((2, 8, 8, 4), dtype=np.float32))

        def loss_fn(cparams):
            return diffusion_loss(
                cparams, up, CFG, sqrt_a, sqrt_1ma,
                batch["x0"], batch["hint"], batch["ctx"], t, noise,
            )

        g_ref = jax.grad(loss_fn)(cp)
        set_kernels(remat=True)
        try:
            g_remat = jax.grad(loss_fn)(cp)
        finally:
            set_kernels(remat=False)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_remat)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


class TestCheckpointResume:
    def test_save_restore_roundtrip(self, tmp_path, rng):
        """Full train-state checkpoint/resume (params + optimizer moments)."""
        from stablediffusioneo_tpu.training.loop import (
            restore_checkpoint, save_checkpoint,
        )
        from stablediffusioneo_tpu.training.trainer import (
            TrainState, create_train_state, make_schedule_buffers, train_step,
        )

        ks = jax.random.split(jax.random.PRNGKey(3), 2)
        up = init_unet(ks[0], CFG.unet)
        cp = init_controlnet(ks[1], CFG.controlnet)
        state, tx = create_train_state(cp, learning_rate=1e-3)
        sqrt_a, sqrt_1ma = make_schedule_buffers(CFG)
        batch = {
            "x0": jnp.asarray(rng.standard_normal((2, 8, 8, 4), dtype=np.float32)),
            "hint": jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32)),
            "ctx": jnp.asarray(rng.standard_normal((2, 5, CFG.unet.context_dim), dtype=np.float32)),
        }
        # one step so optimizer moments are non-trivial
        state, _ = train_step(state, tx, up, CFG, sqrt_a, sqrt_1ma, batch,
                              jax.random.PRNGKey(0))
        path = str(tmp_path / "ckpt")
        save_checkpoint(path, state)
        fresh, _ = create_train_state(cp, learning_rate=1e-3)
        restored = restore_checkpoint(path, fresh)
        assert int(restored.step) == 1
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.opt_state), jax.tree.leaves(restored.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # resumed state steps identically to the original
        s1, l1 = train_step(state, tx, up, CFG, sqrt_a, sqrt_1ma, batch,
                            jax.random.PRNGKey(0))
        s2, l2 = train_step(restored, tx, up, CFG, sqrt_a, sqrt_1ma, batch,
                            jax.random.PRNGKey(0))
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


class TestMeshRuntime:
    def test_runtime_on_mesh(self, rng, mesh_and_params):
        """CNSDRuntime(mesh=...) end to end on the virtual mesh."""
        from stablediffusioneo_tpu.models import init_clip_text, init_vae
        from stablediffusioneo_tpu.runtime.engine import CNSDRuntime

        mesh, up, cp = mesh_and_params
        ks = jax.random.split(jax.random.PRNGKey(9), 2)
        params = {
            "unet": up, "controlnet": cp,
            "vae": init_vae(ks[0], CFG.vae),
            "clip": init_clip_text(ks[1], CFG.clip),
        }
        rt = CNSDRuntime(params, CFG, persistent_cache=False, mesh=mesh)
        ids = np.zeros((4, CFG.clip.max_length), np.int32)
        ctx = rt.encode_prompt(ids)
        x_T = jnp.asarray(rng.standard_normal((4, 8, 8, 4), dtype=np.float32))
        hint = jnp.asarray(rng.random((4, 64, 64, 3), dtype=np.float32))
        z = rt.sample(1, x_T, hint, ctx, ctx, jax.random.PRNGKey(0))
        imgs = rt.decode_latent(z)
        assert imgs.shape == (4, 64, 64, 3) and imgs.dtype == np.uint8
        # params actually sharded over tp
        blk = next(b for b in rt.params["unet"]["input_blocks"] if "attn" in b)
        assert "tp" in str(blk["attn"]["blocks"][0]["attn1"]["wq"]["w"].sharding.spec)


class TestMeshVariants:
    def test_inpaint_and_img2img_engines_on_mesh(self, rng, mesh_and_params):
        """The round-3 engine variants (inpaint blend, img2img-seeds) run
        over a dp x tp mesh: batch-sharded latents/masks/seeds, AOT
        compiled, correct output shapes."""
        from stablediffusioneo_tpu.models import init_clip_text, init_vae
        from stablediffusioneo_tpu.runtime.engine import CNSDRuntime

        mesh, up, cp = mesh_and_params
        ks = jax.random.split(jax.random.PRNGKey(9), 2)
        params = {
            "unet": up, "controlnet": cp,
            "vae": init_vae(ks[0], CFG.vae),
            "clip": init_clip_text(ks[1], CFG.clip),
        }
        rt = CNSDRuntime(params, CFG, persistent_cache=False, mesh=mesh)
        b = 4
        ids = np.zeros((b, CFG.clip.max_length), np.int32)
        ctx = rt.encode_prompt(ids)
        hint = jnp.zeros((b, 64, 64, 3), jnp.uint8)
        lat = jnp.asarray(rng.standard_normal((b, 8, 8, 4)).astype(np.float32))
        mask = jnp.ones((b, 8, 8, 1), jnp.float32)
        out = np.asarray(rt.sample_decode(
            2, None, hint, ctx, ctx, jax.random.PRNGKey(0),
            inpaint_latent=lat, inpaint_mask=mask))
        assert out.shape == (b, 64, 64, 3) and out.dtype == np.uint8
        out2 = np.asarray(rt.sample_decode(
            2, None, hint, ctx, ctx, None, seeds=[1, 2, 3, 4],
            init_latent=lat, t_enc=1))
        assert out2.shape == (b, 64, 64, 3)
        fell_back = [e.name for e in rt._engines.values()
                     if not e.get_engine_infor().get("compiled")]
        assert not fell_back, f"mesh engines fell back: {fell_back}"


class TestFSDP:
    def test_fsdp_train_step_matches_replicated(self, rng):
        """ZeRO-3 sharded training == replicated training, with params,
        grads, and AdamW moments each holding ~1/dp per device."""
        import functools

        from stablediffusioneo_tpu.parallel.mesh import fsdp_shard_params
        from stablediffusioneo_tpu.training.trainer import (
            create_train_state, make_schedule_buffers, train_step,
        )

        ks = jax.random.split(jax.random.PRNGKey(3), 2)
        up = init_unet(ks[0], CFG.unet)
        cp = init_controlnet(ks[1], CFG.controlnet)
        sqrt_a, sqrt_1ma = make_schedule_buffers(CFG)
        b = 8
        batch_h = {
            "x0": rng.standard_normal((b, 8, 8, 4)).astype(np.float32),
            "hint": rng.random((b, 64, 64, 3)).astype(np.float32),
            "ctx": rng.standard_normal(
                (b, 5, CFG.unet.context_dim)).astype(np.float32),
        }
        key = jax.random.PRNGKey(7)

        # reference: replicated single-device step
        state_r, tx = create_train_state(cp, learning_rate=1e-3)
        step = functools.partial(train_step, tx=tx, cfg=CFG)
        new_r, loss_r = jax.jit(step)(
            state_r, unet_params=up, sqrt_abar=sqrt_a,
            sqrt_one_minus_abar=sqrt_1ma,
            batch={k: jnp.asarray(v) for k, v in batch_h.items()}, key=key)

        # FSDP over an 8-way dp mesh: params/moments sharded, batch dp-split
        mesh = make_mesh(dp=8, tp=1)
        up_f = fsdp_shard_params(up, mesh)
        cp_f = fsdp_shard_params(cp, mesh)
        state_f, tx_f = create_train_state(cp_f, learning_rate=1e-3)
        batch_f = {k: jax.device_put(v, data_sharding(mesh, v.ndim))
                   for k, v in batch_h.items()}
        step_f = functools.partial(train_step, tx=tx_f, cfg=CFG)
        with mesh:
            new_f, loss_f = jax.jit(step_f)(
                state_f, unet_params=up_f, sqrt_abar=sqrt_a,
                sqrt_one_minus_abar=sqrt_1ma, batch=batch_f, key=key)

        np.testing.assert_allclose(float(loss_r), float(loss_f),
                                   rtol=1e-5, atol=1e-6)
        for a, c in zip(jax.tree.leaves(new_r.params),
                        jax.tree.leaves(new_f.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=1e-4, atol=1e-6)

        # memory accounting: every large leaf holds 1/8 per device, and the
        # AdamW moments inherited the same shardings via zeros_like
        def shard_ratio(tree):
            big = [x for x in jax.tree.leaves(tree) if x.size >= (1 << 14)]
            assert big, "tiny config produced no large leaves"
            return (sum(x.addressable_shards[0].data.size for x in big)
                    / sum(x.size for x in big))

        assert shard_ratio(state_f.params) <= 1 / 4, "params not sharded"
        moments = [x for x in jax.tree.leaves(state_f.opt_state)
                   if getattr(x, "size", 0) >= (1 << 14)]
        assert moments
        assert (sum(x.addressable_shards[0].data.size for x in moments)
                / sum(x.size for x in moments)) <= 1 / 4, \
            "optimizer moments not sharded"

    def test_fsdp_composes_with_tp(self):
        """On a dp=4 x tp=2 mesh a TP-sharded attention weight picks up a
        dp shard on its other dim; conv kernels shard their largest dim."""
        from stablediffusioneo_tpu.parallel.mesh import (
            fsdp_param_sharding_rules,
        )

        mesh = make_mesh(dp=4, tp=2)
        up = init_unet(jax.random.PRNGKey(0), CFG.unet)
        rules = fsdp_param_sharding_rules(mesh, up, min_size=0)
        blk = next(i for i, b in enumerate(up["input_blocks"]) if "attn" in b)
        wq_rule = rules["input_blocks"][blk]["attn"]["blocks"][0][
            "attn1"]["wq"]["w"].spec
        assert "tp" in wq_rule and "dp" in wq_rule, wq_rule
        conv = up["input_blocks"][0]["conv"]["w"]
        conv_rule = rules["input_blocks"][0]["conv"]["w"].spec
        dims = [d for d, n in zip(conv.shape, conv_rule) if n == "dp"]
        assert dims and dims[0] % 4 == 0, (conv.shape, conv_rule)


class TestSDXLSharding:
    """The TP spec rules are param-path-driven (wq/wk/wv/wo, ff1/ff2), so
    they cover the SDXL family's UNet unchanged — pinned here."""

    def test_sdxl_txt2img_tp_matches_unsharded(self, rng):
        from stablediffusioneo_tpu.models.sdxl import (
            sdxl_txt2img_scan, tiny_sdxl,
        )
        from stablediffusioneo_tpu.ops.schedule import DiffusionSchedule

        cfg = tiny_sdxl()
        up = init_unet(jax.random.PRNGKey(0), cfg.unet)
        sched = DiffusionSchedule().ddim(2)
        b = 4
        x_T = rng.standard_normal((b, 8, 8, 4), dtype=np.float32)
        ctx = rng.standard_normal((b, 5, cfg.unet.context_dim),
                                  dtype=np.float32)
        y = rng.standard_normal((b, cfg.unet.adm_in_channels),
                                dtype=np.float32)
        args = (jnp.asarray(5.0), jax.random.PRNGKey(1))
        ref = np.asarray(sdxl_txt2img_scan(
            up, cfg, sched, jnp.asarray(x_T), jnp.asarray(ctx),
            jnp.asarray(ctx), jnp.asarray(y), jnp.asarray(y), *args))

        mesh = make_mesh(dp=4, tp=2)
        up_s = shard_params(up, mesh)
        # the depth-2 level's transformer linears must actually shard
        specs = {
            leaf.sharding.spec
            for leaf in jax.tree.leaves(up_s)
            if hasattr(leaf, "sharding") and leaf.ndim == 2
        }
        assert P(None, "tp") in specs and P("tp", None) in specs
        with mesh:
            out = sdxl_txt2img_scan(
                up_s, cfg, sched,
                jax.device_put(x_T, data_sharding(mesh, 4)),
                jax.device_put(ctx, data_sharding(mesh, 3)),
                jax.device_put(ctx, data_sharding(mesh, 3)),
                jax.device_put(y, data_sharding(mesh, 2)),
                jax.device_put(y, data_sharding(mesh, 2)),
                *args)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)
