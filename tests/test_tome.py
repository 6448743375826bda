"""ToMe token merging (ops/tome.py; arXiv:2303.17604 / tomesd):
bipartite-soft-matching parity vs an independent numpy mirror,
merge/unmerge round-trip semantics, static alignment of the merge count,
and the transformer-block + engine integration.

The reference has no analog (full-token attention every step); this is
the tomesd accelerator knob of mainstream SD UIs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.ops.tome import (
    _dst_src_partition,
    build_merge,
    merge_count,
)


def numpy_tome(x, metric, h, w, r, sx=2, sy=2):
    """Independent mirror of tomesd's bipartite_soft_matching_random2d
    (use_rand=False) + merge_wavg(mode='mean') + unmerge, written from the
    paper/algorithm, not from ops/tome.py."""
    b, n, c = metric.shape
    rows, cols = np.divmod(np.arange(n), w)
    is_dst = (rows % sy == 0) & (cols % sx == 0)
    dst_idx = np.nonzero(is_dst)[0]
    src_idx = np.nonzero(~is_dst)[0]
    m = metric.astype(np.float64)
    m = m / np.maximum(np.linalg.norm(m, axis=-1, keepdims=True), 1e-12)
    outs, recon = [], []
    for bi in range(b):
        scores = m[bi, src_idx] @ m[bi, dst_idx].T
        node_max = scores.max(axis=1)
        node_arg = scores.argmax(axis=1)
        order = np.argsort(-node_max, kind="stable")
        merged, unm = order[:r], order[r:]
        src = x[bi, src_idx]
        dst = x[bi, dst_idx].astype(np.float64).copy()
        counts = np.ones(len(dst_idx))
        for s in merged:
            dst[node_arg[s]] += src[s]
            counts[node_arg[s]] += 1.0
        dst = dst / counts[:, None]
        y = np.concatenate([src[unm], dst], axis=0)
        outs.append(y)
        # unmerge
        full = np.zeros((n, c))
        full[src_idx[unm]] = src[unm]
        full[dst_idx] = dst
        for s in merged:
            full[src_idx[s]] = dst[node_arg[s]]
        recon.append(full)
    return np.stack(outs), np.stack(recon)


class TestMatchingParity:
    def test_matches_numpy_mirror(self, rng):
        h = w = 8
        n = h * w
        x = rng.standard_normal((2, n, 6)).astype(np.float32)
        r = merge_count(h, w, 0.4, align=1)
        assert 0 < r <= len(_dst_src_partition(h, w, 2, 2)[1])
        merge, unmerge, n_m = build_merge(jnp.asarray(x), h, w, r)
        got_m = np.asarray(merge(jnp.asarray(x)))
        got_u = np.asarray(unmerge(merge(jnp.asarray(x))))
        want_m, want_u = numpy_tome(x, x, h, w, r)
        assert got_m.shape == (2, n - r, 6) and n_m == n - r
        np.testing.assert_allclose(got_m, want_m, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got_u, want_u, rtol=1e-5, atol=1e-6)

    def test_non_square_grid_and_strides(self, rng):
        h, w, sx, sy = 4, 12, 3, 2
        n = h * w
        x = rng.standard_normal((1, n, 4)).astype(np.float32)
        r = merge_count(h, w, 0.3, sx, sy, align=1)
        merge, unmerge, _ = build_merge(jnp.asarray(x), h, w, r, sx, sy)
        want_m, want_u = numpy_tome(x, x, h, w, r, sx, sy)
        np.testing.assert_allclose(np.asarray(merge(jnp.asarray(x))),
                                   want_m, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(unmerge(merge(jnp.asarray(x)))),
            want_u, rtol=1e-5, atol=1e-6)

    def test_metric_differs_from_payload(self, rng):
        """Merge indices come from the metric; values from the payload —
        the block applies matching from x to norm1(x)."""
        h = w = 8
        metric = rng.standard_normal((1, 64, 4)).astype(np.float32)
        payload = rng.standard_normal((1, 64, 4)).astype(np.float32)
        r = merge_count(h, w, 0.4, align=1)
        merge, unmerge, _ = build_merge(jnp.asarray(metric), h, w, r)
        want_m, want_u = numpy_tome(payload, metric, h, w, r)
        np.testing.assert_allclose(np.asarray(merge(jnp.asarray(payload))),
                                   want_m, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(unmerge(merge(jnp.asarray(payload)))),
            want_u, rtol=1e-5, atol=1e-6)


class TestMergeCount:
    def test_alignment_and_caps(self):
        # 64x64 = 4096 tokens at ratio .5 -> exactly 2048 kept (x128)
        assert merge_count(64, 64, 0.5) == 2048
        assert (4096 - merge_count(64, 64, 0.4)) % 128 == 0
        # capped at the src-set size (3N/4 for 2x2)
        assert merge_count(8, 8, 2.0, align=1) == 48
        # zero ratio -> nothing merges
        assert merge_count(64, 64, 0.0) == 0

    def test_round_trip_identity_of_untouched_tokens(self, rng):
        h = w = 8
        x = rng.standard_normal((1, 64, 4)).astype(np.float32)
        r = merge_count(h, w, 0.25, align=1)
        merge, unmerge, _ = build_merge(jnp.asarray(x), h, w, r)
        z = np.asarray(unmerge(merge(jnp.asarray(x))))
        # exactly r src tokens lose identity; dsts that absorbed them change
        changed = (np.abs(z - x).max(axis=-1) > 1e-6).sum()
        assert r <= changed <= 2 * r


class TestBlockIntegration:
    def test_ratio_zero_is_same_path(self, rng):
        """grid_hw given but ratio 0 -> identical output to no grid_hw."""
        import dataclasses

        from stablediffusioneo_tpu.config import tiny_pipeline
        from stablediffusioneo_tpu.models import init_unet
        from stablediffusioneo_tpu.models.unet import unet_apply

        cfg = tiny_pipeline().unet
        params = init_unet(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
        t = jnp.zeros((1,), jnp.float32)
        ctx = jnp.asarray(rng.standard_normal((1, 16, cfg.context_dim))
                          .astype(np.float32))
        base = unet_apply(params, cfg, x, t, ctx)
        cfg_zero = dataclasses.replace(cfg, tome_ratio=0.0,
                                       tome_min_tokens=1)
        np.testing.assert_array_equal(
            np.asarray(base),
            np.asarray(unet_apply(params, cfg_zero, x, t, ctx)))

    def test_tome_changes_output_and_stays_finite(self, rng):
        import dataclasses

        from stablediffusioneo_tpu.config import tiny_pipeline
        from stablediffusioneo_tpu.models import init_unet
        from stablediffusioneo_tpu.models.unet import unet_apply

        cfg = tiny_pipeline().unet
        cnt = iter(jax.random.split(jax.random.PRNGKey(1), 4096))
        params = jax.tree.map(
            lambda v: jax.random.normal(next(cnt), v.shape, v.dtype) * 0.05,
            init_unet(jax.random.PRNGKey(0), cfg))
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
        t = jnp.zeros((1,), jnp.float32)
        ctx = jnp.asarray(rng.standard_normal((1, 16, cfg.context_dim))
                          .astype(np.float32))
        base = unet_apply(params, cfg, x, t, ctx)
        cfg_on = dataclasses.replace(cfg, tome_ratio=0.5, tome_min_tokens=16)
        on = unet_apply(params, cfg_on, x, t, ctx)
        assert np.isfinite(np.asarray(on)).all()
        assert np.abs(np.asarray(on) - np.asarray(base)).max() > 1e-6


@pytest.mark.slow
class TestEngineIntegration:
    def test_sample_decode_tome_variant(self, rng):
        import dataclasses

        from stablediffusioneo_tpu.config import tiny_pipeline
        from stablediffusioneo_tpu.models import (
            init_clip_text, init_controlnet, init_unet, init_vae,
        )
        from stablediffusioneo_tpu.runtime.engine import CNSDRuntime

        cfg = tiny_pipeline()
        # tiny grid is 8x8 = 64 tokens; lower the site threshold so the
        # tome variant actually merges in this test
        u = dataclasses.replace(cfg.unet, tome_min_tokens=16)
        cfg = dataclasses.replace(
            cfg, unet=u,
            controlnet=dataclasses.replace(cfg.controlnet, unet=u))
        ks = jax.random.split(jax.random.PRNGKey(3), 4)
        cnt = iter(jax.random.split(ks[0], 4096))
        params = {
            "unet": jax.tree.map(
                lambda v: jax.random.normal(next(cnt), v.shape, v.dtype) * .05,
                init_unet(ks[0], cfg.unet)),
            "controlnet": init_controlnet(ks[1], cfg.controlnet),
            "vae": init_vae(ks[2], cfg.vae),
            "clip": init_clip_text(ks[3], cfg.clip),
        }
        rt = CNSDRuntime(params, cfg, persistent_cache=False)
        ids = np.zeros((1, cfg.clip.max_length), np.int32)
        ctx = rt.encode_prompt(ids)
        hint = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
        key = jax.random.PRNGKey(1)
        base = np.asarray(rt.sample_decode(2, None, hint, ctx, ctx, key,
                                           guidance_scale=9.0))
        on = np.asarray(rt.sample_decode(2, None, hint, ctx, ctx, key,
                                         guidance_scale=9.0,
                                         tome_ratio=0.5))
        assert on.shape == base.shape == (1, 64, 64, 3)
        assert on.dtype == np.uint8
        assert not np.array_equal(base, on), "tome had no effect"
        # distinct engine variants; 0.0 shares the default engine
        e0 = rt.sample_decode_engine(2, 1, 64, 64)
        assert rt.sample_decode_engine(2, 1, 64, 64, tome_ratio=0.0) is e0
        assert rt.sample_decode_engine(2, 1, 64, 64, tome_ratio=0.5) is not e0
