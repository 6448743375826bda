"""LoRA adapter tests: site discovery, merge semantics, identity at init,
frozen-base training, save/load accounting, runtime apply.

Beyond-reference feature (the reference fine-tunes the full ControlNet
branch, cldm/cldm.py:416-423); semantics follow arXiv:2106.09685."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.config import tiny_pipeline
from stablediffusioneo_tpu.models import init_controlnet, init_unet
from stablediffusioneo_tpu.training.lora import (
    count_params,
    init_lora,
    load_lora,
    lora_sites,
    lora_train_step,
    merge_lora,
    n_sites,
    save_lora,
)

CFG = tiny_pipeline()


@pytest.fixture(scope="module")
def base():
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    return {
        "unet": init_unet(ks[0], CFG.unet),
        "controlnet": init_controlnet(ks[1], CFG.controlnet),
    }


class TestLoraTree:
    def test_sites_are_attention_and_mlp_linears(self, base):
        paths = lora_sites(base["unet"])
        assert paths, "no sites found"
        leaves = {p[-1] for p in paths}
        assert leaves <= {"wq", "wk", "wv", "wo", "ff1", "ff2"}
        # every transformer block contributes both attentions + the MLP
        assert any(p[-1] == "ff1" for p in paths)
        assert any("attn2" in p for p in paths)

    def test_clip_tower_sites(self):
        """The CLIP text tower's q/k/v/out + fc1/fc2 naming is targeted too
        (text-encoder LoRA, the usual companion of a UNet adapter)."""
        from stablediffusioneo_tpu.models import init_clip_text

        clip = init_clip_text(jax.random.PRNGKey(0), CFG.clip)
        paths = lora_sites(clip)
        leaves = {p[-1] for p in paths}
        assert {"q", "k", "v", "out", "fc1", "fc2"} <= leaves, leaves
        lora = init_lora(jax.random.PRNGKey(1), clip, rank=2)
        merged = merge_lora(clip, lora)  # identity at init, full accounting
        jax.tree.map(np.testing.assert_array_equal, clip, merged)

    def test_rank_and_footprint(self, base):
        lora = init_lora(jax.random.PRNGKey(1), base["unet"], rank=4)
        for leaf in jax.tree.leaves(lora):
            assert 4 in leaf.shape
        # the whole point: adapters are orders of magnitude smaller
        assert count_params(lora) < count_params(base["unet"]) / 10
        assert n_sites(lora) == len(lora_sites(base["unet"]))

    def test_merge_identity_at_init(self, base):
        lora = init_lora(jax.random.PRNGKey(1), base["unet"], rank=4)
        merged = merge_lora(base["unet"], lora, scale=1.0)
        # b = 0 at init => w' == w exactly
        jax.tree.map(np.testing.assert_array_equal, base["unet"], merged)

    def test_merge_math_single_site(self, base):
        lora = init_lora(jax.random.PRNGKey(1), base["unet"], rank=4)
        path = lora_sites(base["unet"])[0]
        site = lora
        wsite = base["unet"]
        for k in path:
            site, wsite = site[k], wsite[k]
        site["b"] = jax.random.normal(
            jax.random.PRNGKey(2), site["b"].shape, site["b"].dtype)
        merged = merge_lora(base["unet"], lora, scale=0.5)
        msite = merged
        for k in path:
            msite = msite[k]
        want = wsite["w"] + 0.5 * (site["a"] @ site["b"])
        np.testing.assert_allclose(np.asarray(msite["w"]),
                                   np.asarray(want), rtol=1e-6)
        # untargeted leaves are untouched (same buffer)
        flat_b = dict(jax.tree_util.tree_flatten_with_path(base["unet"])[0])
        flat_m = dict(jax.tree_util.tree_flatten_with_path(merged)[0])
        conv_paths = [p for p, v in flat_b.items() if v.ndim == 4]
        assert conv_paths
        for p in conv_paths:
            assert flat_m[p] is flat_b[p]


class TestMergeAccounting:
    def test_wrong_target_tree_raises(self, base):
        """A unet adapter merged into the controlnet must fail loudly, not
        silently part-merge — the decoder (output_blocks) sites have no
        matching controlnet path. (The reverse direction is structurally
        valid: the ControlNet IS a UNet-encoder copy, so its adapter paths
        all exist in the UNet — accounting can only catch path orphans.)"""
        lora = init_lora(jax.random.PRNGKey(1), base["unet"], rank=2)
        with pytest.raises(ValueError,
                           match="no matching path|does not match"):
            merge_lora(base["controlnet"], lora)

    def test_shape_mismatch_raises(self, base):
        lora = init_lora(jax.random.PRNGKey(1), base["unet"], rank=2)
        path = lora_sites(base["unet"])[0]
        node = lora
        for k in path[:-1]:
            node = node[k]
        site = node[path[-1]]
        site["a"] = jnp.zeros((site["a"].shape[0] + 1, 2), site["a"].dtype)
        with pytest.raises(ValueError, match="does not match"):
            merge_lora(base["unet"], lora)

    def test_runtime_apply_wrong_on_raises(self, base):
        from stablediffusioneo_tpu.runtime.engine import CNSDRuntime
        from stablediffusioneo_tpu.models import init_clip_text, init_vae

        ks = jax.random.split(jax.random.PRNGKey(9), 2)
        params = dict(base)
        params["vae"] = init_vae(ks[0], CFG.vae)
        params["clip"] = init_clip_text(ks[1], CFG.clip)
        rt = CNSDRuntime(params, CFG, persistent_cache=False)
        lora = init_lora(jax.random.PRNGKey(1), base["unet"], rank=2)
        with pytest.raises(ValueError):
            rt.apply_lora(lora, on="controlnet")


class TestSaveLoad:
    def test_roundtrip(self, base, tmp_path):
        lora = init_lora(jax.random.PRNGKey(1), base["controlnet"], rank=8)
        p = str(tmp_path / "adapter.npz")
        save_lora(p, lora, alpha=16.0, on="controlnet")
        tree, meta = load_lora(p)
        assert meta["alpha"] == 16.0 and meta["rank"] == 8
        assert meta["on"] == "controlnet"
        jax.tree.map(np.testing.assert_array_equal, lora, tree)

    def test_rejects_foreign_and_incomplete_files(self, base, tmp_path):
        p = str(tmp_path / "foreign.npz")
        np.savez(p, some_weight=np.zeros(3))
        with pytest.raises(ValueError, match="__meta__"):
            load_lora(p)
        # an 'a' without its 'b' fails accounting
        lora = init_lora(jax.random.PRNGKey(1), base["controlnet"], rank=2)
        path = lora_sites(base["controlnet"])[0]
        node = lora
        for k in path:
            node = node[k]
        del node["b"]
        p2 = str(tmp_path / "incomplete.npz")
        save_lora(p2, lora, alpha=2.0)
        with pytest.raises(ValueError, match="incomplete"):
            load_lora(p2)


@pytest.mark.slow
class TestLoraTraining:
    def test_train_step_moves_only_adapters(self, base):
        import functools

        from stablediffusioneo_tpu.training.trainer import (
            create_train_state, make_schedule_buffers,
        )

        lora = init_lora(jax.random.PRNGKey(1), base["controlnet"], rank=4)
        state, tx = create_train_state(lora, learning_rate=1e-3)
        sqrt_a, sqrt_1ma = make_schedule_buffers(CFG)
        rng = np.random.default_rng(0)
        batch = {
            "x0": rng.standard_normal((2, 8, 8, 4)).astype(np.float32),
            "hint": rng.random((2, 64, 64, 3)).astype(np.float32),
            "ctx": rng.standard_normal(
                (2, 5, CFG.unet.context_dim)).astype(np.float32),
        }
        step = jax.jit(functools.partial(
            lora_train_step, tx=tx, cfg=CFG, on="controlnet", scale=1.0))
        losses = []
        for i in range(8):
            state, loss = step(state, frozen=base,
                               sqrt_abar=sqrt_a, sqrt_one_minus_abar=sqrt_1ma,
                               batch=batch, key=jax.random.PRNGKey(3))
            losses.append(float(loss))
        # same (t, noise) draw each step (key + step folding is
        # deterministic per step index, but the fixed batch still gives a
        # decreasing trend over a short horizon)
        assert losses[-1] < losses[0], losses
        # adapters moved; the frozen trees were never touched by reference
        moved = jax.tree.leaves(jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), lora, state.params))
        assert max(moved) > 0

    def test_runtime_apply_lora_changes_outputs(self, base):
        from stablediffusioneo_tpu.runtime.engine import CNSDRuntime
        from stablediffusioneo_tpu.models import init_clip_text, init_vae

        ks = jax.random.split(jax.random.PRNGKey(9), 3)
        params = dict(base)
        params["vae"] = init_vae(ks[0], CFG.vae)
        params["clip"] = init_clip_text(ks[1], CFG.clip)
        # The SD UNet zero-initializes every block's output projection
        # (the reference's zero_module: out head, ResBlock out conv,
        # SpatialTransformer proj_out), so at random init eps_hat is
        # INDEPENDENT of the attention weights LoRA adapts. Re-randomize
        # the whole tree so the output actually depends on them.
        cnt = iter(jax.random.split(ks[2], 4096))
        params["unet"] = jax.tree.map(
            lambda x: jax.random.normal(next(cnt), x.shape, x.dtype) * 0.05,
            base["unet"])
        rt = CNSDRuntime(params, CFG, persistent_cache=False)
        ids = np.zeros((1, CFG.clip.max_length), np.int32)
        ctx = rt.encode_prompt(ids)
        x_T = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4), rt.dtype)
        hint = jnp.zeros((1, 64, 64, 3), jnp.uint8)
        key = jax.random.PRNGKey(2)
        img0 = np.asarray(rt.sample_decode(2, x_T, hint, ctx, ctx, key))

        lora = init_lora(jax.random.PRNGKey(4), base["unet"], rank=4,
                         dtype=rt.dtype)
        # non-trivial b so the merge actually changes the weights
        lora = jax.tree_util.tree_map_with_path(
            lambda p, x: x if p[-1].key != "b" else
            jax.random.normal(jax.random.PRNGKey(5), x.shape, x.dtype) * 0.1,
            lora)
        n = rt.apply_lora(lora, scale=1.0, on="unet")
        assert n == n_sites(lora)
        img1 = np.asarray(rt.sample_decode(2, x_T, hint, ctx, ctx, key))
        assert img0.shape == img1.shape
        assert np.any(img0 != img1), "merged adapters had no effect"

    def test_loop_driver_lora_and_fsdp(self, base):
        """train(lora_rank=..., fsdp=True) runs end to end and returns the
        adapter tree (not full-branch params)."""
        from stablediffusioneo_tpu.training.loop import train
        from stablediffusioneo_tpu.training.lora import merge_lora

        rng = np.random.default_rng(0)

        def data_iter():
            while True:
                yield {
                    "x0": rng.standard_normal((8, 8, 8, 4)).astype(np.float32),
                    "hint": rng.random((8, 64, 64, 3)).astype(np.float32),
                    "ctx": rng.standard_normal(
                        (8, 5, CFG.unet.context_dim)).astype(np.float32),
                }

        state = train(CFG, base["unet"], base["controlnet"], data_iter(),
                      num_steps=2, dp=8, tp=1, lora_rank=4, fsdp=True,
                      ema_decay=None, metrics_path=None)
        assert int(state.step) == 2
        assert count_params(state.params) < count_params(
            base["controlnet"]) / 10
        # the adapters merge back onto the frozen branch cleanly
        merged = merge_lora(base["controlnet"], jax.device_get(state.params))
        assert jax.tree.structure(merged) == jax.tree.structure(
            base["controlnet"])

    def test_runtime_apply_lora_rejects_quantized(self, base):
        from stablediffusioneo_tpu.runtime.engine import CNSDRuntime
        from stablediffusioneo_tpu.models import init_clip_text, init_vae

        ks = jax.random.split(jax.random.PRNGKey(9), 2)
        params = dict(base)
        params["vae"] = init_vae(ks[0], CFG.vae)
        params["clip"] = init_clip_text(ks[1], CFG.clip)
        rt = CNSDRuntime(params, CFG, persistent_cache=False,
                         quantize_linears=True)
        lora = init_lora(jax.random.PRNGKey(4), base["unet"], rank=2)
        with pytest.raises(ValueError, match="quantized"):
            rt.apply_lora(lora)
