"""Fused GroupNorm(+SiLU) Pallas TPU kernels.

Replaces the reference's TensorRT CUDA plugin (two-kernel NHWC fp16
block-scan + normalize, plugin/groupNormPlugin/groupNormKernel.cu:50-266)
with a TPU-shaped redesign (SURVEY §7 "Pallas GroupNorm"):

  * channels stay whole in every block (Mosaic lane rule: the last block
    dim must be 128-divisible or full — SD's 320/640/1280 channels are not
    128-divisible, so partial-channel chunks are illegal); spatial rows are
    the chunking axis (sublane rule: multiple of 8);
  * statistics are fp32 and computed on the MXU: per-channel Σx/Σx² via a
    ones-vector matmul, then channel->group aggregation via a static 0/1
    group-membership matmul — sidestepping the lane-misaligned
    (C,)->(G, C/G) reshape (C/G = 10/20/40 for SD, none aligned);
  * small slabs (fit in VMEM): ONE kernel, x read from HBM once, written
    once — 2/3 of the CUDA plugin's traffic;
  * large slabs (e.g. VAE decoder at 512²): stats kernel over spatial
    chunks producing per-chunk partial sums, tiny XLA group-reduction, then
    a normalize+scale+SiLU kernel — exactly the CUDA plugin's two-pass
    structure (2 reads + 1 write), but over ICI-friendly full-channel rows.

Dispatch happens in ops/norms.group_norm.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-enabled builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

# Mosaic's scoped-vmem limit is 16 MB. Three regimes:
#   tiny slabs  (<= ~850k elems x 18 B): whole-slab fp32 math in one shot;
#   resident    (<= ~1.6M elems): in/out slabs live in VMEM (8 B/elem with
#               double buffering) but fp32 temporaries are kept CHUNK-sized
#               by looping over row blocks inside the kernel — still exactly
#               one HBM read + one write (covers SD's 4096x320 level-0 GN);
#   larger      : two-pass spatially-chunked kernels (VAE-scale slabs).
_SINGLE_PASS_MAX_ELEMS = (15 * 1024 * 1024) // 18
_RESIDENT_MAX_ELEMS = (13 * 1024 * 1024) // 8
_CHUNK_BUDGET_BYTES = 6 * 1024 * 1024
_BYTES_PER_ELEM_EST = 16
_RESIDENT_ROW_CHUNK = 512


def _spatial_chunk(hw: int, c: int) -> int:
    """Largest row chunk: == hw when a VMEM-resident kernel fits, else a
    multiple of 8 that divides hw and fits the chunk budget (0 if none)."""
    if hw * c <= _RESIDENT_MAX_ELEMS and (
        hw * c <= _SINGLE_PASS_MAX_ELEMS
        or (hw % 8 == 0)
    ):
        return hw
    max_rows = _CHUNK_BUDGET_BYTES // (c * _BYTES_PER_ELEM_EST)
    chunk = 0
    for cand in range(8, max_rows + 1, 8):
        if hw % cand == 0:
            chunk = cand
    return chunk


def group_norm_pallas_supported(shape, dtype, groups: int) -> bool:
    """Dispatch predicate: only the single-fused-kernel case (whole slab in
    VMEM, ONE HBM read) beats XLA — measured on v5e, the two-pass chunked
    path is slower than XLA's own fused two-read lowering (bench r1:
    512px VAE decode 148ms pallas-two-pass vs 85ms XLA), so large slabs
    take the XLA path. fused_group_norm itself still supports both."""
    if not _HAS_PLTPU or len(shape) != 4:
        return False
    n, h, w, c = shape
    if c % groups:
        return False
    return _spatial_chunk(h * w, c) == h * w


def _membership(c: int, groups: int) -> np.ndarray:
    m = np.zeros((c, groups), np.float32)
    m[np.arange(c), np.arange(c) // (c // groups)] = 1.0
    return m


def _col_sums(xf):
    """Σx and Σx² per channel via MXU: (HWc, C) -> two (1, C)."""
    ones = jnp.ones((1, xf.shape[0]), jnp.float32)
    s = jnp.dot(ones, xf, preferred_element_type=jnp.float32)
    ss = jnp.dot(ones, xf * xf, preferred_element_type=jnp.float32)
    return s, ss


def _group_stats(s, ss, m, inv_count, eps):
    """Channel sums -> per-channel (mean, rstd) via group matmuls."""
    gs = jnp.dot(s, m, preferred_element_type=jnp.float32)
    gss = jnp.dot(ss, m, preferred_element_type=jnp.float32)
    mean_g = gs * inv_count
    var_g = gss * inv_count - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jax.lax.dot_general(
        mean_g, m, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    rstd_c = jax.lax.dot_general(
        rstd_g, m, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    return mean_c, rstd_c


def _affine_act(xf, mean_c, rstd_c, g, b, swish):
    y = (xf - mean_c) * rstd_c
    y = y * g.astype(jnp.float32) + b.astype(jnp.float32)
    if swish:
        y = y * jax.nn.sigmoid(y)
    return y


# ------------------------------------------------------------ fused (small)


def _gn_fused_kernel(x_ref, g_ref, b_ref, m_ref, o_ref, *, eps, swish, inv_count):
    xf = x_ref[0].astype(jnp.float32)
    s, ss = _col_sums(xf)
    mean_c, rstd_c = _group_stats(s, ss, m_ref[:], inv_count, eps)
    o_ref[0] = _affine_act(xf, mean_c, rstd_c, g_ref[:], b_ref[:], swish).astype(
        o_ref.dtype
    )


def _gn_resident_kernel(
    x_ref, g_ref, b_ref, m_ref, o_ref, *, eps, swish, inv_count, row_chunk
):
    """Whole slab resident in VMEM; fp32 temporaries chunk-sized: one
    accumulation loop over row blocks, then one normalize loop. Exactly one
    HBM read + one write of x."""
    hw, c = x_ref.shape[1], x_ref.shape[2]
    n_chunks = hw // row_chunk
    ones = jnp.ones((1, row_chunk), jnp.float32)

    def acc_body(i, carry):
        s, ss = carry
        xf = x_ref[0, pl.ds(i * row_chunk, row_chunk), :].astype(jnp.float32)
        s = s + jnp.dot(ones, xf, preferred_element_type=jnp.float32)
        ss = ss + jnp.dot(ones, xf * xf, preferred_element_type=jnp.float32)
        return (s, ss)

    s, ss = jax.lax.fori_loop(
        0, n_chunks, acc_body,
        (jnp.zeros((1, c), jnp.float32), jnp.zeros((1, c), jnp.float32)),
    )
    mean_c, rstd_c = _group_stats(s, ss, m_ref[:], inv_count, eps)
    g = g_ref[:]
    b = b_ref[:]

    def norm_body(i, _):
        xf = x_ref[0, pl.ds(i * row_chunk, row_chunk), :].astype(jnp.float32)
        y = _affine_act(xf, mean_c, rstd_c, g, b, swish)
        o_ref[0, pl.ds(i * row_chunk, row_chunk), :] = y.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_chunks, norm_body, 0)


# ------------------------------------------------------- two-pass (large)


def _gn_stats_kernel(x_ref, part_ref):
    xf = x_ref[0].astype(jnp.float32)
    s, ss = _col_sums(xf)
    part_ref[0, 0] = jnp.concatenate([s, ss], axis=0)  # (2, C)


def _gn_apply_kernel(x_ref, stats_ref, g_ref, b_ref, o_ref, *, swish):
    xf = x_ref[0].astype(jnp.float32)
    mean_c = stats_ref[0, 0:1, :]
    rstd_c = stats_ref[0, 1:2, :]
    o_ref[0] = _affine_act(xf, mean_c, rstd_c, g_ref[:], b_ref[:], swish).astype(
        o_ref.dtype
    )


def _spec(block, index_map):
    if _HAS_PLTPU:
        return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)
    return pl.BlockSpec(block, index_map)


@functools.partial(
    jax.jit, static_argnames=("groups", "eps", "swish", "interpret")
)
def fused_group_norm(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    groups: int = 32,
    eps: float = 1e-5,
    swish: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """x: (N, H, W, C) -> GroupNorm(+SiLU)."""
    n, h, w, c = x.shape
    hw = h * w
    cg = c // groups
    hw_chunk = _spatial_chunk(hw, c)
    assert hw_chunk > 0, f"unsupported shape {x.shape} (use group_norm fallback)"
    k = hw // hw_chunk
    inv_count = 1.0 / (hw * cg)
    m = jnp.asarray(_membership(c, groups))
    x3 = x.reshape(n, hw, c)
    g2 = gamma.reshape(1, c)
    b2 = beta.reshape(1, c)

    if k == 1:
        if hw * c <= _SINGLE_PASS_MAX_ELEMS:
            kernel = functools.partial(
                _gn_fused_kernel, eps=eps, swish=swish, inv_count=inv_count
            )
        else:
            row_chunk = _RESIDENT_ROW_CHUNK
            while hw % row_chunk:
                row_chunk //= 2
            kernel = functools.partial(
                _gn_resident_kernel, eps=eps, swish=swish,
                inv_count=inv_count, row_chunk=row_chunk,
            )
        out = pl.pallas_call(
            kernel,
            grid=(n,),
            in_specs=[
                _spec((1, hw, c), lambda i: (i, 0, 0)),
                _spec((1, c), lambda i: (0, 0)),
                _spec((1, c), lambda i: (0, 0)),
                _spec((c, groups), lambda i: (0, 0)),
            ],
            out_specs=_spec((1, hw, c), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
            interpret=interpret,
        )(x3, g2, b2, m)
        return out.reshape(n, h, w, c)

    # pass 1: per-chunk channel sums
    partials = pl.pallas_call(
        _gn_stats_kernel,
        grid=(n, k),
        in_specs=[_spec((1, hw_chunk, c), lambda i, j: (i, j, 0))],
        out_specs=_spec((1, 1, 2, c), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, k, 2, c), jnp.float32),
        interpret=interpret,
    )(x3)
    # tiny XLA reduction: chunk partials -> per-channel mean/rstd
    sums = jnp.sum(partials, axis=1)  # (N, 2, C)
    s, ss = sums[:, 0], sums[:, 1]  # (N, C)
    gs = s @ m  # (N, G)
    gss = ss @ m
    mean_g = gs * inv_count
    var_g = gss * inv_count - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = mean_g @ m.T  # (N, C)
    rstd_c = rstd_g @ m.T
    stats = jnp.stack([mean_c, rstd_c], axis=1)  # (N, 2, C)

    # pass 2: normalize + affine + SiLU
    out = pl.pallas_call(
        functools.partial(_gn_apply_kernel, swish=swish),
        grid=(n, k),
        in_specs=[
            _spec((1, hw_chunk, c), lambda i, j: (i, j, 0)),
            _spec((1, 2, c), lambda i, j: (i, 0, 0)),
            _spec((1, c), lambda i, j: (0, 0)),
            _spec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=_spec((1, hw_chunk, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
        interpret=interpret,
    )(x3, stats, g2, b2)
    return out.reshape(n, h, w, c)
