"""Mesh construction and sharding rules.

Layout strategy (How-to-Scale-Your-Model style): pick a mesh, annotate
shardings on params + batch inputs, let GSPMD insert collectives over ICI.

  dp — batch axis: independent images/CFG pairs shard with zero
       communication (the principled replacement for the reference's
       dual-stream cond/uncond overlap and batch-2 engines).
  tp — tensor axis: attention q/k/v/o and MLP channels Megatron-style;
       heads split over tp (head-count divisible), one psum per block
       riding ICI, inserted automatically by GSPMD from the param
       shardings below.
  sp — spatial/sequence axis: the latent's H dim (NHWC) shards over sp,
       and GSPMD propagates it through the whole UNet — convs get halo
       exchanges (XLA spatial partitioning), GroupNorm moments get
       cross-shard reductions, and the flatten into transformer tokens
       carries the shard onto the token dim, where the partition-aware
       Pallas attention keeps q sharded and gathers only K/V
       (ops/pallas/attention.py). This is the single-image LATENCY axis:
       batch-1 CFG work only fills dp=2, so sp puts the remaining chips
       on one image's pixels. Params are replicated over sp.
  pp — pipeline axis: GPipe stage scheduling for homogeneous transformer
       stacks (parallel/pipeline.py — explicit shard_map + ppermute; the
       one axis GSPMD annotations can't express). Used by the
       conditioner towers (models/clip.py clip_text_apply_pp), NOT the
       UNet (skip connections make stage cuts carry the whole encoder
       activation set; dp/tp/sp cover it).

Convs stay channel-replicated (channel-sharded GroupNorm needs a fused
cross-shard moment reduction — a later Pallas optimization); at SD latent
resolutions attention+MLP dominate the tp-shardable FLOPs, while sp
shards conv + norm + attention FLOPs alike.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence] = None,
    sp: int = 1,
    pp: int = 1,
) -> Mesh:
    """Create a (dp, tp) / (dp, sp, tp) / (pp, dp[, sp], tp) mesh.
    dp=None -> all remaining devices. Size-1 extra axes are omitted so
    existing two-axis specs/tests stay unchanged. Axis order = collective
    cost order: pp OUTERMOST (point-to-point, once per stage per
    microbatch — tolerates the slowest links, even DCN), then dp (one
    grad all-reduce per step), sp, and tp INNERMOST (per-block psums ride
    the fastest ICI)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % (tp * sp * pp) == 0, \
            f"{n} devices not divisible by tp={tp}*sp={sp}*pp={pp}"
        dp = n // (tp * sp * pp)
    assert pp * dp * sp * tp <= n, f"mesh {pp}x{dp}x{sp}x{tp} > {n} devices"
    dims = [("pp", pp), ("dp", dp), ("sp", sp), ("tp", tp)]
    keep = [(name, size) for name, size in dims
            if size > 1 or name in ("dp", "tp")]
    shape = tuple(size for _, size in keep)
    arr = np.asarray(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(arr, axis_names=tuple(name for name, _ in keep))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) dim over dp, replicate the rest."""
    return NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))


def latent_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard an NHWC latent/image: batch over dp, H over sp (when the
    mesh has one). GSPMD propagates the sp shard through the UNet; see
    the module docstring. ndim<2 (timesteps etc.) falls back to dp-only."""
    if "sp" not in mesh.shape or ndim < 2:
        return data_sharding(mesh, ndim)
    return NamedSharding(mesh, P("dp", "sp", *([None] * (ndim - 2))))


# --------------------------------------------------------------- param rules


def _spec_for_path(path: Tuple[str, ...], ndim: int) -> P:
    """Megatron-style TP specs from param-tree paths (models/unet.py,
    models/clip.py naming)."""
    names = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    names = [n for n in names if isinstance(n, str)]
    if not names:
        return P()
    leaf = names[-1]
    parent = names[-2] if len(names) >= 2 else ""
    gparent = names[-3] if len(names) >= 3 else ""

    # TP rules target LINEAR projections only; conv kernels (4D, e.g. the
    # VAE's conv-attention q/k/v) stay replicated.
    if leaf == "w" and ndim != 2:
        return P()
    if leaf == "b" and ndim != 1:
        return P()

    # attention projections (UNet transformer blocks + CLIP layers)
    if leaf == "w":
        if parent in ("wq", "wk", "wv") or parent in ("q", "k", "v"):
            return P(None, "tp")
        if parent in ("wo", "out"):
            return P("tp", None)
        if parent in ("ff1", "fc1"):
            return P(None, "tp")
        if parent in ("ff2", "fc2"):
            return P("tp", None)
    if leaf == "b":
        if parent in ("ff1", "fc1"):
            return P("tp")
    return P()


def _tp_spec(path, leaf, tp: int) -> P:
    """TP spec for one leaf, including the GEGLU ff1 guard: ff1 concatenates
    [value; gate] along its output dim, so shard it only when each half
    divides the tp extent cleanly — no device shard may straddle the
    value/gate boundary (a straddling shard is still correct under GSPMD
    but forces a reshard at the split). GEGLU lives only in UNet blocks;
    CLIP fc1 is plain GELU."""
    spec = _spec_for_path(path, getattr(leaf, "ndim", 0))
    names = [getattr(p, "key", None) for p in path]
    if "ff1" in names:
        out_dim = leaf.shape[-1] if getattr(leaf, "ndim", 0) else 0
        if out_dim % (2 * tp) != 0:
            spec = P()
    return spec


def unet_param_sharding_rules(mesh: Mesh, params) -> Dict:
    """NamedSharding tree for a UNet/CLIP-style param tree (TP on attention
    and MLP, everything else replicated)."""

    tp = mesh.shape.get("tp", 1)

    def to_sharding(path, leaf):
        return NamedSharding(mesh, _tp_spec(path, leaf, tp))

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_params(params, mesh: Mesh):
    """device_put the tree with its TP sharding rules applied."""
    shardings = unet_param_sharding_rules(mesh, params)
    return jax.device_put(params, shardings)


# ----------------------------------------------------------------- FSDP


def fsdp_param_sharding_rules(
    mesh: Mesh, params, min_size: int = 1 << 14
) -> Dict:
    """ZeRO-3-style sharding: every large param leaf is sharded over the
    "dp" axis (on TOP of its TP spec), so params + grads + AdamW moments
    each hold 1/dp of the tree per device. GSPMD inserts the all-gather at
    use and the reduce-scatter on the grads — the How-to-Scale FSDP recipe,
    no manual collectives.

    Per leaf: pick the largest dim that (a) isn't already taken by tp and
    (b) divides the dp extent; leaves smaller than `min_size` elements stay
    replicated (gather latency beats the memory win for norm scales and
    biases)."""
    dp = mesh.shape.get("dp", 1)

    tp = mesh.shape.get("tp", 1)

    def to_sharding(path, leaf):
        ndim = getattr(leaf, "ndim", 0)
        spec = list(_tp_spec(path, leaf, tp)) if ndim else []
        spec += [None] * (ndim - len(spec))
        shape = getattr(leaf, "shape", ())
        if dp > 1 and int(np.prod(shape or (0,))) >= min_size:
            # largest free dim that divides dp
            cands = [i for i in range(ndim)
                     if spec[i] is None and shape[i] % dp == 0]
            if cands:
                i = max(cands, key=lambda i: shape[i])
                spec[i] = "dp"
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def fsdp_shard_params(params, mesh: Mesh):
    """device_put the tree with FSDP(+TP) shardings applied."""
    return jax.device_put(params, fsdp_param_sharding_rules(mesh, params))
