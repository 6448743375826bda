"""Token Merging for Stable Diffusion (ToMe; Bolya & Hoffman 2023,
arXiv:2303.17604 — the `tomesd` accelerator mainstream SD UIs expose).

Opt-in, training-free acceleration of the self-attention sites that
dominate SD device time: spatially redundant tokens are merged before
self-attention and unmerged after, shrinking the quadratic (Tq x Tk)
logits cost. The xplane profile (docs/xplane_512.md) shows the seq-4096
self-attention sites are the ONE row that never amortizes with batch
(106 ms/img flat at 512²) — exactly the tokens ToMe removes.

The reference has no analog (its TRT engines run full-token attention
every step, cldm_trt/ddim_hacked.py:88-197); this matches the tomesd
knob of A1111/ComfyUI. Like `encoder_cache_interval`, it trades a small
fidelity cost for throughput and is OFF by default.

Design notes (TPU/XLA-first):
- everything is STATIC-shaped: the merge count r is a trace-time int,
  token selection is data-dependent but rides gathers/scatters of fixed
  shape, so one compiled program serves every request.
- dst selection is DETERMINISTIC (top-left of each sx x sy cell) — the
  `use_rand=False` flavor of tomesd's bipartite_soft_matching_random2d.
  No RNG threads through the UNet, and outputs stay reproducible.
- merged token counts are rounded so the merged Tq stays a multiple of
  128 — the packed Pallas attention kernel's tiling constraint — so the
  fast kernel keeps dispatching on the merged sequence.
- unmerge is a single permutation-free gather: per-token source
  positions in the merged sequence are built with two cheap int32
  scatters, then one take_along_axis reconstructs the full sequence
  (cheaper than 3 scatters of (B, N, C) activations).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _dst_src_partition(h: int, w: int, sx: int, sy: int):
    """Static partition of the h*w token grid: dst = top-left token of
    each sy x sx cell, src = the rest. Returns (dst_idx, src_idx) int32
    numpy arrays (sorted ascending), with dst_idx of size ceil(h/sy) *
    ceil(w/sx)."""
    rows = np.arange(h)
    cols = np.arange(w)
    is_dst = ((rows[:, None] % sy == 0) & (cols[None, :] % sx == 0))
    flat = is_dst.reshape(-1)
    dst_idx = np.nonzero(flat)[0].astype(np.int32)
    src_idx = np.nonzero(~flat)[0].astype(np.int32)
    return dst_idx, src_idx


def merge_count(h: int, w: int, ratio: float, sx: int = 2, sy: int = 2,
                align: int = 128) -> int:
    """The static merge count r for an h x w grid: floor(N * ratio),
    capped at the src-set size, then reduced so the merged length
    (N - r) is a multiple of `align` when possible (keeps the packed
    attention kernel dispatching). Returns 0 when nothing merges."""
    n = h * w
    dst_idx, src_idx = _dst_src_partition(h, w, sx, sy)
    r = min(int(n * ratio), len(src_idx))
    if align > 1 and n > align:
        # round the MERGED length (n - r) up to the alignment (merge
        # slightly fewer tokens than requested, never more); grids at or
        # below the alignment skip this — the packed kernel doesn't
        # dispatch at those sizes anyway (ops/attention._min_tq)
        kept = -(-(n - r) // align) * align
        r = max(n - kept, 0)
    return max(r, 0)


def build_merge(metric: jax.Array, h: int, w: int, r: int,
                sx: int = 2, sy: int = 2):
    """Bipartite soft matching over the 2D grid (ToMe §3 / tomesd
    bipartite_soft_matching_random2d with use_rand=False).

    metric: (B, N, C) with N == h * w — the features tokens are matched
    on (the transformer-block input x, per tomesd). r: static number of
    src tokens to merge (see merge_count).

    Returns (merge, unmerge, n_merged):
      merge(x)  : (B, N, C') -> (B, N - r, C')  [unmerged srcs ++ dsts,
                  merged srcs averaged into their best-match dst]
      unmerge(y): (B, N - r, C') -> (B, N, C')  [dst values copied back
                  to the positions of the tokens merged into them]
    Both close over the (data-dependent, fixed-shape) index tensors, so
    they can be applied to any feature tensor of the same token layout
    (e.g. computed on x, applied to norm1(x))."""
    b, n, _ = metric.shape
    assert n == h * w, (n, h, w)
    dst_np, src_np = _dst_src_partition(h, w, sx, sy)
    n_dst, n_src = len(dst_np), len(src_np)
    assert 0 < r <= n_src, (r, n_src)
    dst_idx = jnp.asarray(dst_np)
    src_idx = jnp.asarray(src_np)
    n_unm = n_src - r

    mf = metric.astype(jnp.float32)
    mf = mf / jnp.maximum(
        jnp.linalg.norm(mf, axis=-1, keepdims=True), 1e-12)
    a = jnp.take(mf, src_idx, axis=1)            # (B, n_src, C)
    bm = jnp.take(mf, dst_idx, axis=1)           # (B, n_dst, C)
    scores = jnp.einsum("bsc,bdc->bsd", a, bm)   # (B, n_src, n_dst)
    node_max = jnp.max(scores, axis=-1)          # (B, n_src)
    node_idx = jnp.argmax(scores, axis=-1).astype(jnp.int32)
    # most-similar src tokens merge; argsort descending, stable
    order = jnp.argsort(-node_max, axis=-1).astype(jnp.int32)
    merged_sl = order[:, :r]                     # slots into the src set
    unm_sl = order[:, r:]                        # (B, n_unm)
    dst_of_merged = jnp.take_along_axis(node_idx, merged_sl, axis=1)

    # global token ids of the unmerged/merged src slots: gathering from x
    # directly skips materializing the full (B, n_src, C) src view twice
    glob_unm = jnp.take_along_axis(
        jnp.broadcast_to(src_idx, (b, n_src)), unm_sl, axis=1)
    glob_mrg = jnp.take_along_axis(
        jnp.broadcast_to(src_idx, (b, n_src)), merged_sl, axis=1)

    def merge(x: jax.Array) -> jax.Array:
        dst = jnp.take(x, dst_idx, axis=1)       # (B, n_dst, C')
        unm = jnp.take_along_axis(
            x, glob_unm[..., None], axis=1)      # (B, n_unm, C')
        mrg = jnp.take_along_axis(
            x, glob_mrg[..., None], axis=1)      # (B, r, C')
        # mean-reduce merged srcs into their dst (fp32 accumulation)
        dstf = dst.astype(jnp.float32)
        summed = jax.vmap(
            lambda d, m, i: d.at[i].add(m)
        )(dstf, mrg.astype(jnp.float32), dst_of_merged)
        counts = jax.vmap(
            lambda i: jnp.ones((n_dst,), jnp.float32).at[i].add(1.0)
        )(dst_of_merged)
        dst_out = (summed / counts[..., None]).astype(x.dtype)
        return jnp.concatenate([unm, dst_out], axis=1)

    def unmerge(y: jax.Array) -> jax.Array:
        # per-src-slot position in y: unmerged slot j -> j, merged slot
        # -> n_unm + its dst row. Two int32 scatters + one gather.
        pos_unm = jnp.arange(n_unm, dtype=jnp.int32)
        src_pos = jax.vmap(
            lambda u, m, d: jnp.zeros((n_src,), jnp.int32)
            .at[u].set(pos_unm)
            .at[m].set(n_unm + d)
        )(unm_sl, merged_sl, dst_of_merged)      # (B, n_src)
        dst_pos = jnp.broadcast_to(
            n_unm + jnp.arange(n_dst, dtype=jnp.int32), (b, n_dst))
        # static permutation: token order of concat([src, dst]) -> 0..N
        perm = jnp.asarray(np.argsort(np.concatenate([src_np, dst_np]))
                           .astype(np.int32))
        full_pos = jnp.concatenate([src_pos, dst_pos], axis=1)[:, perm]
        return jnp.take_along_axis(y, full_pos[..., None], axis=1)

    return merge, unmerge, n - r
