"""Pipeline parallelism (parallel/pipeline.py) on the 8-device virtual mesh.

Parity target: `pipeline_apply` must equal sequentially applying the same
layers (f32 on CPU -> allclose at ~1e-6), forward AND backward, for every
mesh composition (pp alone, pp x dp) and microbatch count. The CLIP tower
wrapper (`clip_text_apply_pp`) must match `clip_text_apply` for every
`layer=` selection mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stablediffusioneo_tpu.config import tiny_pipeline
from stablediffusioneo_tpu.models.clip import (
    clip_text_apply,
    clip_text_apply_pp,
    init_clip_text,
)
from stablediffusioneo_tpu.parallel.mesh import make_mesh
from stablediffusioneo_tpu.parallel.pipeline import (
    pipeline_apply,
    pp_shard_params,
    stack_layer_params,
    unstack_layer_params,
)

CFG = tiny_pipeline()


def toy_layers(n_layers=8, d=16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), n_layers)
    return [
        {"w": jax.random.normal(k, (d, d)) * (0.5 / np.sqrt(d)),
         "b": jax.random.normal(k, (d,)) * 0.01}
        for k in ks
    ]


def toy_fn(p, x, scale):
    return jnp.tanh(x @ p["w"] + p["b"]) * scale + x


def sequential(layers, x, scale):
    for p in layers:
        x = toy_fn(p, x, scale)
    return x


SCALE = np.float32(0.7)


class TestPrimitive:
    def test_forward_parity_pp4_dp2(self):
        layers = toy_layers()
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 6, 16))
        mesh = make_mesh(dp=2, tp=1, pp=4)
        assert mesh.axis_names == ("pp", "dp", "tp")
        got = pipeline_apply(toy_fn, stack_layer_params(layers), x, mesh,
                             extra=(SCALE,))
        want = sequential(layers, x, SCALE)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("microbatches", [1, 2, 4])
    def test_microbatch_counts(self, microbatches):
        layers = toy_layers()
        x = jax.random.normal(jax.random.PRNGKey(2), (8, 5, 16))
        mesh = make_mesh(dp=1, tp=1, pp=8)
        got = pipeline_apply(toy_fn, stack_layer_params(layers), x, mesh,
                             extra=(SCALE,), microbatches=microbatches)
        want = sequential(layers, x, SCALE)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)

    def test_single_stage_degenerate(self):
        layers = toy_layers(n_layers=4)
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 16))
        mesh = make_mesh(dp=8, tp=1)  # no pp axis of size > 1
        mesh1 = make_mesh(dp=8, tp=1, pp=1)
        assert mesh1.axis_names == mesh.axis_names  # pp=1 omitted
        mesh_pp = make_mesh(dp=4, tp=1, pp=2)
        got = pipeline_apply(toy_fn, stack_layer_params(layers), x, mesh_pp,
                             extra=(SCALE,))
        want = sequential(layers, x, SCALE)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)

    def test_capture_last_input(self):
        layers = toy_layers()
        x = jax.random.normal(jax.random.PRNGKey(4), (4, 3, 16))
        mesh = make_mesh(dp=2, tp=1, pp=4)
        out, pen = pipeline_apply(toy_fn, stack_layer_params(layers), x,
                                  mesh, extra=(SCALE,),
                                  capture_last_input=True)
        want_pen = sequential(layers[:-1], x, SCALE)
        np.testing.assert_allclose(np.asarray(pen), np.asarray(want_pen),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(toy_fn(layers[-1], want_pen,
                                                     SCALE)),
                                   rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("remat", [False, True])
    def test_grad_parity(self, remat):
        """GPipe backward: per-stage param grads match the sequential
        model's, and land sharded over pp (each stage's grads on its own
        devices)."""
        layers = toy_layers(n_layers=4, d=8)
        stacked = stack_layer_params(layers)
        x = jax.random.normal(jax.random.PRNGKey(5), (4, 3, 8))
        mesh = make_mesh(dp=2, tp=1, pp=2)
        stacked_dev = pp_shard_params(stacked, mesh)

        def loss_pp(p):
            y = pipeline_apply(toy_fn, p, x, mesh, extra=(SCALE,),
                               remat=remat)
            return jnp.sum(y ** 2)

        def loss_seq(p_stacked):
            y = sequential(unstack_layer_params(p_stacked), x, SCALE)
            return jnp.sum(y ** 2)

        g_pp = jax.jit(jax.grad(loss_pp))(stacked_dev)
        g_seq = jax.grad(loss_seq)(stacked)
        for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_seq)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)
        # stage grads stay stage-sharded
        specs = {tuple(l.sharding.spec) for l in jax.tree.leaves(g_pp)}
        assert all(s[0] == "pp" for s in specs), specs

    def test_layer_count_must_tile_stages(self):
        layers = toy_layers(n_layers=6)
        x = jnp.zeros((4, 3, 16))
        mesh = make_mesh(dp=2, tp=1, pp=4)
        with pytest.raises(ValueError, match="tile"):
            pipeline_apply(toy_fn, stack_layer_params(layers), x, mesh,
                           extra=(SCALE,))

    def test_stack_roundtrip(self):
        layers = toy_layers(n_layers=3)
        back = unstack_layer_params(stack_layer_params(layers))
        for a, b in zip(layers, back):
            for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
                np.testing.assert_array_equal(np.asarray(la),
                                              np.asarray(lb))


class TestClipPP:
    @pytest.fixture(scope="class")
    def tower(self):
        params = init_clip_text(jax.random.PRNGKey(7), CFG.clip)
        ids = np.zeros((4, CFG.clip.max_length), np.int32)
        rng = np.random.default_rng(7)
        ids[:, :] = rng.integers(0, CFG.clip.vocab_size,
                                 ids.shape).astype(np.int32)
        return params, ids

    @pytest.mark.parametrize("layer", ["last", "penultimate",
                                       "penultimate_raw"])
    def test_clip_pp_parity(self, tower, layer):
        params, ids = tower
        n_layers = len(params["layers"])
        pp = 2 if n_layers % 2 == 0 else 1
        assert pp > 1, f"tiny clip has {n_layers} layers; need even for pp"
        mesh = make_mesh(dp=2, tp=1, pp=pp)
        got = clip_text_apply_pp(params, CFG.clip, ids, mesh, layer=layer)
        want = clip_text_apply(params, CFG.clip, ids, layer=layer)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_batched_extra_per_stage_indexing(self):
        """A per-sample side input must travel with its microbatch: at
        tick t stage s works on microbatch t-s, so indexing extras by t
        alone would hand stages>0 the wrong slice. Catch it with a layer
        that ADDS the per-sample extra (any mis-slice shifts outputs)."""
        def fn(p, x, e):
            return jnp.tanh(x @ p["w"]) + e

        d = 8
        layers = [{"w": jax.random.normal(jax.random.PRNGKey(i), (d, d))
                   * 0.3} for i in range(4)]
        x = jax.random.normal(jax.random.PRNGKey(9), (8, 3, d))
        e = jax.random.normal(jax.random.PRNGKey(10), (8, 3, d))
        mesh = make_mesh(dp=2, tp=1, pp=4)
        got = pipeline_apply(fn, stack_layer_params(layers), x, mesh,
                             batched_extra=(e,), microbatches=2)
        want = x
        for p in layers:
            want = fn(p, want, e)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)

    def test_clip_pp_prestacked(self, tower):
        params, ids = tower
        mesh = make_mesh(dp=2, tp=1, pp=2)
        pre = dict(params)
        pre["layers"] = stack_layer_params(params["layers"])
        got = clip_text_apply_pp(pre, CFG.clip, ids, mesh)
        want = clip_text_apply(params, CFG.clip, ids)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


class TestT5PP:
    @pytest.fixture(scope="class")
    def tower(self):
        from stablediffusioneo_tpu.models.t5 import init_t5, tiny_t5

        cfg = tiny_t5()
        params = init_t5(jax.random.PRNGKey(3), cfg)
        rng = np.random.default_rng(3)
        ids = rng.integers(0, cfg.vocab_size,
                           (4, cfg.max_length)).astype(np.int32)
        return cfg, params, ids

    def test_t5_pp_parity_no_mask(self, tower):
        from stablediffusioneo_tpu.models.t5 import t5_encode, t5_encode_pp

        cfg, params, ids = tower
        mesh = make_mesh(dp=2, tp=1, pp=2)
        got = t5_encode_pp(params, cfg, jnp.asarray(ids), mesh)
        want = t5_encode(params, cfg, jnp.asarray(ids))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_t5_pp_parity_padding_mask(self, tower):
        """The per-sample bias (mask path) rides batched_extra — wrong
        per-stage indexing would corrupt every padded row."""
        from stablediffusioneo_tpu.models.t5 import t5_encode, t5_encode_pp

        cfg, params, ids = tower
        mask = np.ones_like(ids)
        mask[0, 5:] = 0
        mask[2, 9:] = 0
        mask[3, 2:] = 0
        mesh = make_mesh(dp=2, tp=1, pp=2)
        got = t5_encode_pp(params, cfg, jnp.asarray(ids), mesh,
                           mask=jnp.asarray(mask), microbatches=2)
        want = t5_encode(params, cfg, jnp.asarray(ids),
                         mask=jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
