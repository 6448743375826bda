"""Fused LayerNorm Pallas TPU kernel.

Motivation (docs/xplane_sdxl.md): the SDXL-base step spends ~26 ms (23% of
device time) in 233 `convert_reduce_fusion` launches — the fp32 norm
statistics. Most of those sites are transformer-block LayerNorms
(norm1/2/3 per block, ldm reference attention.py:355-385), where XLA's
lowering is a separate row-reduction kernel (a full HBM re-read of the
input) followed by the scale/shift FMA read+write. Measured on the r4
profile those reduce kernels run at ~11% of HBM bandwidth — row
reductions to a (R, 1) output are a bad fit for XLA's loop emitter.

This kernel reads each (rows, C) tile ONCE, computes the fp32 row stats
in VMEM, and writes the normalized+affine output — one HBM read + one
write total, with the reduction running at VPU speed over
VMEM-resident data instead of HBM-streamed loop iterations.

Layout rules (same family as ops/pallas/groupnorm.py): channels stay
whole in every block (the lane dim must be 128-divisible or full; C is
free to be e.g. 320), rows are the chunking axis (multiples of 8 for the
sublane rule). The flattened row count of SD/SDXL transformer LN sites is
B*T with T in {1024, 4096, 9216, 16384} — all row-chunkable.

Dispatch happens in ops/norms.layer_norm (flag "layernorm",
ops/dispatch.py). bf16-only by design: the fp32 path keeps the exact
two-pass XLA form that the fp32 integration-parity tests pin down.

VERDICT (r5 ledger, docs/performance.md): e2e-NEGATIVE, default OFF.
The isolated premise holds (the kernel is one read + one write), but the
same-session SDXL A/B measured p50 2.97 s with the kernel vs 2.71 s
without (1024^2, 20-step, real chip) — at 60+ custom-call sites per
step the fusion/scheduling barrier costs more than XLA's stats re-read.
Same failure family as ops/pallas/groupnorm.py ("What matters" #6).
Kept as an opt-in (SDEO_FORCE_LN_PALLAS=1) for future XLA regressions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-enabled builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

# Per-block VMEM: in + out tiles in dtype, one fp32 temp of the tile, and
# small per-row stats. ~12 B/elem for bf16 with Mosaic double-buffering
# headroom under the default 16M scoped limit.
_BLOCK_BUDGET_BYTES = 6 * 1024 * 1024
_BYTES_PER_ELEM_EST = 12
# Below this many elements the launch overhead beats XLA's fused lowering
# (tiny LNs — CLIP's (2,77,768) towers — stay on XLA).
_MIN_ELEMS = 256 * 1024


def _pick_rows(rows: int, c: int) -> int:
    """Largest row chunk (multiple of 8, divides rows) fitting the budget;
    0 if none."""
    max_rows = _BLOCK_BUDGET_BYTES // (c * _BYTES_PER_ELEM_EST)
    best = 0
    for cand in range(8, max_rows + 1, 8):
        if rows % cand == 0:
            best = cand
    return best


def layer_norm_pallas_supported(shape, dtype) -> bool:
    """Dispatch predicate: bf16, big enough to beat XLA's fused form, and
    row-chunkable under the VMEM budget."""
    if not _HAS_PLTPU or len(shape) < 2:
        return False
    if jnp.dtype(dtype) != jnp.bfloat16:
        return False
    c = shape[-1]
    rows = 1
    for s in shape[:-1]:
        rows *= s
    if rows * c < _MIN_ELEMS:
        return False
    return _pick_rows(rows, c) > 0


def _ln_kernel(x_ref, g_ref, b_ref, o_ref, *, eps, inv_c):
    xf = x_ref[...].astype(jnp.float32)  # (br, C)
    s1 = jnp.sum(xf, axis=-1, keepdims=True)
    s2 = jnp.sum(xf * xf, axis=-1, keepdims=True)
    mean = s1 * inv_c
    var = s2 * inv_c - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    g = g_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    o_ref[...] = ((xf - mean) * rstd * g + b).astype(o_ref.dtype)


def _spec(block, index_map):
    if _HAS_PLTPU:
        return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)
    return pl.BlockSpec(block, index_map)


def _ln_math(x, gamma, beta, eps):
    """XLA reference of the kernel's math (fp32 stats, dtype out) — the
    custom-VJP backward differentiates this recompute form, mirroring the
    attention kernels' VJP strategy (ops/pallas/attention.py)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    y = (xf - mean) * rstd * gamma.astype(jnp.float32) \
        + beta.astype(jnp.float32)
    return y.astype(x.dtype)


def fused_layer_norm(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jax.Array:
    """LayerNorm over the last dim of x (any leading dims), fp32 stats,
    single fused kernel: one HBM read + one write of x. Differentiable via
    a custom VJP (XLA-recompute backward)."""
    return _ln_vjp(x, gamma, beta, float(eps), bool(interpret))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ln_vjp(x, gamma, beta, eps, interpret):
    return _ln_call(x, gamma, beta, eps, interpret)


def _ln_fwd(x, gamma, beta, eps, interpret):
    return _ln_call(x, gamma, beta, eps, interpret), (x, gamma, beta)


def _ln_bwd(eps, interpret, res, g):
    x, gamma, beta = res
    _, vjp = jax.vjp(lambda a, gm, bt: _ln_math(a, gm, bt, eps),
                     x, gamma, beta)
    return vjp(g)


_ln_vjp.defvjp(_ln_fwd, _ln_bwd)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _ln_call(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jax.Array:
    shape = x.shape
    c = shape[-1]
    rows = 1
    for s in shape[:-1]:
        rows *= s
    br = _pick_rows(rows, c)
    assert br > 0, f"unsupported LN shape {shape} (use layer_norm fallback)"
    x2 = x.reshape(rows, c)
    g2 = gamma.reshape(1, c)
    b2 = beta.reshape(1, c)
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps, inv_c=1.0 / c),
        grid=(rows // br,),
        in_specs=[
            _spec((br, c), lambda i: (i, 0)),
            _spec((1, c), lambda i: (0, 0)),
            _spec((1, c), lambda i: (0, 0)),
        ],
        out_specs=_spec((br, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, c), x.dtype),
        interpret=interpret,
    )(x2, g2, b2)
    return out.reshape(shape)
