"""Pipeline parallelism (GPipe-style) over a `pp` mesh axis.

The reference framework has no pipeline parallelism at all (its dist utils
— vendored torch DDP helpers — are unused; SURVEY.md §2 #37). This module
exists because pp is the one canonical parallelism axis the mesh story
would otherwise lack: dp/tp/sp/FSDP are GSPMD-annotation-driven
(`parallel/mesh.py`), while pp needs explicit stage scheduling — a
shard_map program with `ppermute` between stages.

Where pp applies HERE: homogeneous transformer stacks — the CLIP/OpenCLIP
text towers (12/24/32 identical pre-LN blocks) and the T5 encoder. At
SD-1.5 text sizes pp is pure overhead (the bubble dominates 77-token
encodes); at T5-XXL / bigG-scale towers, stage-sharding the layer stack is
how a tower that doesn't fit one chip's HBM runs at all. The diffusion
UNet itself is deliberately NOT pipelined: its skip connections make every
stage cut carry the full set of encoder activations across the wire, and
dp/tp/sp already cover its scaling (docs/deployment.md).

Schedule: classic GPipe. The batch splits into M microbatches; at tick t,
stage s runs microbatch (t - s); activations `ppermute` one hop per tick;
total ticks M + S - 1, bubble fraction (S-1)/(M+S-1). Stage-local layers
run under one `lax.scan` (optionally rematerialized), so the whole
pipeline is a single compiled program — no per-microbatch dispatch.

Side inputs: `extra` entries are whole-tensor broadcast to every layer
call (attention masks, scales). `batched_extra` entries carry a leading
batch dim and are microbatched alongside `x` — each stage indexes ITS
OWN current microbatch (tick t, stage s -> microbatch t - s), which is
the GPipe subtlety a naive "index extras by t" would get wrong for every
stage but the first.

Autodiff: everything inside is scan/ppermute/dynamic-slice, so
`jax.grad` through `pipeline_apply` yields the standard GPipe backward
(reverse ppermutes) with per-stage parameter grads landing sharded over
`pp` — each stage's grads live on its own devices.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_layer_params(layers: Sequence[Any]):
    """Stack a list of identically-shaped per-layer param trees into one
    tree with a leading layer dim — the layout `pipeline_apply` shards
    over `pp` (and the layout `lax.scan` consumes stage-locally)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def unstack_layer_params(stacked):
    """Inverse of `stack_layer_params` (host-side convenience)."""
    n = jax.tree.leaves(stacked)[0].shape[0]
    return [jax.tree.map(lambda a: a[i], stacked) for i in range(n)]


def pipeline_apply(
    layer_fn: Callable,
    stacked_params,
    x: jax.Array,
    mesh: Mesh,
    *,
    extra: Tuple = (),
    batched_extra: Tuple = (),
    axis: str = "pp",
    microbatches: Optional[int] = None,
    batch_axis: Optional[str] = "dp",
    capture_last_input: bool = False,
    remat: bool = False,
):
    """Run `x` through L stacked layers pipelined over the mesh's `axis`.

    layer_fn(p, x, *batched_extra, *extra) -> y with y.shape == x.shape
    (a residual transformer block). `extra` entries reach every layer
    call whole (attention masks, scalars); `batched_extra` entries have
    x's leading batch dim and are microbatched with it (per-sample
    biases). Both are passed through shard_map as real inputs, so traced
    values (e.g. a bias computed from params) are fine. `stacked_params`
    leaves carry a leading L dim (see `stack_layer_params`); L must tile
    the stage count.

    The batch dim of `x` additionally shards over `batch_axis` when the
    mesh has it (pp composes with dp for free — each dp replica runs its
    own pipeline over its batch shard). Each device's local batch splits
    into `microbatches` (default: the stage count S, the smallest M that
    keeps every stage busy in steady state; bubble = (S-1)/(M+S-1)).

    capture_last_input=True additionally returns the input to the
    globally-last layer — the "penultimate hidden state" CLIP-style
    towers select for conditioning (models/clip.py clip_text_apply).

    remat=True rematerializes each layer in the backward pass
    (jax.checkpoint on layer_fn), the standard GPipe memory trade.

    Returns y (and the penultimate hidden when requested), replicated
    over `axis` (one small psum publishes the last stage's result) and
    sharded over `batch_axis`.
    """
    S = int(mesh.shape[axis])
    L = int(jax.tree.leaves(stacked_params)[0].shape[0])
    if L % S != 0:
        raise ValueError(f"{L} layers do not tile {S} pipeline stages")
    dp = int(mesh.shape.get(batch_axis, 1)) if batch_axis else 1
    b_total = int(x.shape[0])
    use_dp = batch_axis is not None and dp > 1 and b_total % dp == 0
    b_local = b_total // dp if use_dp else b_total
    M = int(microbatches) if microbatches else min(S, b_local)
    if b_local % M != 0:
        raise ValueError(
            f"local batch {b_local} does not tile {M} microbatches")
    for e in batched_extra:
        if int(np.shape(e)[0]) != b_total:
            raise ValueError(
                f"batched_extra leading dim {np.shape(e)[0]} != batch "
                f"{b_total}")

    f = jax.checkpoint(layer_fn) if remat else layer_fn
    nb = len(batched_extra)
    capture = bool(capture_last_input)  # static: shapes the scan carry

    def stage_block(p_local, xin, bex, rex):
        """All of one stage's layers; also the input to its last layer
        (only the LAST stage's value is the global penultimate)."""
        head = jax.tree.map(lambda a: a[:-1], p_local)
        p_last = jax.tree.map(lambda a: a[-1], p_local)
        x1, _ = lax.scan(
            lambda c, p: (f(p, c, *bex, *rex), None), xin, head)
        return f(p_last, x1, *bex, *rex), x1

    def body(p_local, x_local, *ex_local):
        rex = ex_local[nb:]  # replicated extras, whole
        idx = lax.axis_index(axis)
        xm = x_local.reshape(M, b_local // M, *x_local.shape[1:])
        exm = [e.reshape(M, e.shape[0] // M, *e.shape[1:])
               for e in ex_local[:nb]]
        zero_mb = jnp.zeros_like(xm[0])

        def tick(carry, t):
            buf, outb, penb = carry
            mb = lax.dynamic_index_in_dim(
                xm, jnp.clip(t, 0, M - 1), 0, keepdims=False)
            xin = jnp.where(idx == 0, mb, buf)
            # stage s works on microbatch t - s this tick: index ITS
            # current microbatch of each batched extra
            ms = jnp.clip(t - idx, 0, M - 1)
            bex = [lax.dynamic_index_in_dim(e, ms, 0, keepdims=False)
                   for e in exm]
            y, pen = stage_block(p_local, xin, bex, rex)
            nxt = lax.ppermute(
                y, axis, [(i, i + 1) for i in range(S - 1)]
            ) if S > 1 else y
            # stage S-1 finished microbatch m at this tick
            m = t - (S - 1)
            valid = (idx == S - 1) & (m >= 0) & (m < M)
            mcl = jnp.clip(m, 0, M - 1)

            def put(bufr, val):
                old = lax.dynamic_index_in_dim(bufr, mcl, 0, keepdims=False)
                return lax.dynamic_update_index_in_dim(
                    bufr, jnp.where(valid, val, old), mcl, 0)

            # the penultimate buffer (a second full (M, b, T, D) scratch +
            # a pp all-reduce below) only exists when the caller asked for
            # it — T5/toy users don't pay for CLIP's hidden-state capture
            penb = put(penb, pen) if capture else penb
            return (nxt, put(outb, y), penb), None

        init = (zero_mb, jnp.zeros_like(xm),
                jnp.zeros_like(xm) if capture else jnp.zeros((), xm.dtype))
        (_, outb, penb), _ = lax.scan(
            tick, init, jnp.arange(M + S - 1))
        # publish the last stage's buffers to every pp peer (tiny for
        # encoder outputs; keeps the result spec pp-replicated so the
        # caller composes it like any GSPMD array)
        mask = (idx == S - 1).astype(outb.dtype)
        out = lax.psum(outb * mask, axis).reshape(x_local.shape)
        if not capture:
            return (out,)
        pen = lax.psum(penb * mask, axis).reshape(x_local.shape)
        return out, pen

    bspec = P(batch_axis) if use_dp else P()
    pspec = P(axis)
    res = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: pspec, stacked_params), bspec,
                  *([bspec] * nb), *([P()] * len(extra))),
        out_specs=(bspec, bspec) if capture else (bspec,),
        check_vma=False,
    )(stacked_params, x, *batched_extra, *jax.tree.map(jnp.asarray, extra))
    return (res[0], res[1]) if capture else res[0]


def pp_stage_sharding(mesh: Mesh, stacked_params, axis: str = "pp"):
    """NamedSharding tree placing each stage's slice of the stacked layer
    params on its own pp devices (leading layer dim over `axis`)."""
    def spec(leaf):
        nd = getattr(leaf, "ndim", 0)
        return NamedSharding(mesh, P(axis, *([None] * (nd - 1))))
    return jax.tree.map(spec, stacked_params)


def pp_shard_params(stacked_params, mesh: Mesh, axis: str = "pp"):
    """device_put stacked layer params with their stage shardings."""
    return jax.device_put(
        stacked_params, pp_stage_sharding(mesh, stacked_params, axis))
