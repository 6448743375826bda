"""Microbench: d=64 lane-padding ceiling at the SDXL attention shapes.

Measures the packed Pallas kernel at the SDXL hot sites (d=64) against a
same-channel d=128 configuration (half the heads). The d=128 number is the
absolute ceiling any head-repacking scheme could reach; the block-diagonal
pass-count argument says no valid packing reaches it (packing 2 heads into
one K=128 contraction doubles N for logits or K for AV — same MXU time).

Chains REPS kernel applications inside ONE jitted program (output feeds
the next call's q) so per-call device time is measured, not the tunnel's
per-dispatch RTT.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from stablediffusioneo_tpu.ops.pallas.attention import fused_attention_packed

print("devices:", jax.devices())
REPS = 40


def bench(b, t, c, heads, iters=5):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, t, c)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, t, c)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, t, c)), jnp.bfloat16)
    d = c // heads

    @jax.jit
    def chain(q, k, v):
        def body(x, _):
            y = fused_attention_packed(x, k, v, heads, d ** -0.5)
            return y, ()
        out, _ = jax.lax.scan(body, q, None, length=REPS)
        return out

    out = chain(q, k, v)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        out = chain(q, k, v)
        jax.block_until_ready(out)
        np.asarray(out[0, 0, 0])  # fetch barrier
        best = min(best, time.perf_counter() - t0)
    dt = best / REPS * 1e3
    flops = 4 * b * t * t * c  # QK^T + AV, useful FLOPs
    print(f"  (b={b},t={t},c={c}) h={heads} d={d}: {dt:.3f} ms/call "
          f"({flops/dt*1e-9:.1f} TFLOP/s useful)")
    return dt


print("SDXL level-3 self-attn (32x32, 1280ch):")
t64 = bench(2, 1024, 1280, 20)
t128 = bench(2, 1024, 1280, 10)
print(f"  d=128 ceiling recovers {t64 - t128:.3f} ms/call "
      f"({(1 - t128 / t64) * 100:.0f}%)")

print("SDXL level-2 self-attn (64x64, 640ch):")
t64b = bench(2, 4096, 640, 10)
t128b = bench(2, 4096, 640, 5)
print(f"  d=128 ceiling recovers {t64b - t128b:.3f} ms/call "
      f"({(1 - t128b / t64b) * 100:.0f}%)")
