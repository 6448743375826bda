"""AutoencoderKL (SD first stage) — functional JAX, NHWC.

Re-design of the reference's VAE towers
(ldm/modules/diffusionmodules/model.py): `Encoder` (:368-443), `Decoder`
(:546-652), `ResnetBlock` (:90-150), `AttnBlock` single-head conv attention
(:152-203), `Upsample`/`Downsample` (:49-87, note the asymmetric (0,1,0,1)
downsample padding), plus `DiagonalGaussianDistribution`
(ldm/modules/distributions/distributions.py:24-62). The AutoencoderKL class
itself is missing from the reference snapshot (gitignored `ldm/models/`);
its quant_conv/post_quant_conv/scale_factor behavior is reconstructed here.

All GroupNorms use eps=1e-6 (model.py:46-47) — different from the UNet's
1e-5. SD-1.5 VAE has no attention in the up/down towers (attn_resolutions
empty), only in the mid block; this implementation covers exactly that
configuration.

The latent convention follows LatentDiffusion: `encode` returns the
DiagonalGaussian of quant_conv(encoder(x)); callers scale by
cfg.scale_factor (0.18215); `decode` takes the SCALED latent and divides
first (the missing ddpm.py `decode_first_stage` behavior).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.config import VAEConfig
from stablediffusioneo_tpu.ops.attention import attention
from stablediffusioneo_tpu.ops.layers import (
    conv2d,
    conv_init,
    norm_init,
    silu,
    upsample_nearest_2x,
)
from stablediffusioneo_tpu.ops.norms import group_norm


def init_resnet_block(key, cin: int, cout: int):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": norm_init(cin),
        "conv1": conv_init(ks[0], 3, 3, cin, cout),
        "norm2": norm_init(cout),
        "conv2": conv_init(ks[1], 3, 3, cout, cout),
    }
    if cin != cout:
        p["nin_shortcut"] = conv_init(ks[2], 1, 1, cin, cout)
    return p


def resnet_block_apply(p: dict, cfg: VAEConfig, x):
    h = group_norm(x, p["norm1"]["g"], p["norm1"]["b"], cfg.groups, cfg.norm_eps, swish=True)
    h = conv2d(h, p["conv1"], padding=1)
    h = group_norm(h, p["norm2"]["g"], p["norm2"]["b"], cfg.groups, cfg.norm_eps, swish=True)
    h = conv2d(h, p["conv2"], padding=1)
    if "nin_shortcut" in p:
        x = conv2d(x, p["nin_shortcut"], padding=0)
    return x + h


def init_attn_block(key, c: int):
    ks = jax.random.split(key, 4)
    return {
        "norm": norm_init(c),
        "q": conv_init(ks[0], 1, 1, c, c),
        "k": conv_init(ks[1], 1, 1, c, c),
        "v": conv_init(ks[2], 1, 1, c, c),
        "proj_out": conv_init(ks[3], 1, 1, c, c),
    }


def attn_block_apply(p: dict, cfg: VAEConfig, x):
    """Single-head conv attention over the full spatial grid (model.py:179-203)."""
    n, h_, w_, c = x.shape
    h = group_norm(x, p["norm"]["g"], p["norm"]["b"], cfg.groups, cfg.norm_eps)
    q = conv2d(h, p["q"], padding=0).reshape(n, 1, h_ * w_, c)
    k = conv2d(h, p["k"], padding=0).reshape(n, 1, h_ * w_, c)
    v = conv2d(h, p["v"], padding=0).reshape(n, 1, h_ * w_, c)
    # single head with an explicit head axis so the fused Pallas attention
    # kernel can dispatch (the VAE mid-block at 512px is 4096 tokens x 512)
    out = attention(q, k, v)
    out = out.reshape(n, h_, w_, c)
    out = conv2d(out, p["proj_out"], padding=0)
    return x + out


def _downsample(p: dict, x):
    """Stride-2 conv with asymmetric (right/bottom) padding (model.py:80-87)."""
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return conv2d(x, p, stride=2, padding=0)


def init_vae(key, cfg: VAEConfig) -> Dict:
    ks = iter(jax.random.split(key, 128))
    # ---- encoder
    enc: Dict = {"conv_in": conv_init(next(ks), 3, 3, cfg.in_channels, cfg.ch)}
    block_in = cfg.ch
    down = []
    for i_level, mult in enumerate(cfg.ch_mult):
        block_out = cfg.ch * mult
        blocks = []
        for _ in range(cfg.num_res_blocks):
            blocks.append(init_resnet_block(next(ks), block_in, block_out))
            block_in = block_out
        level = {"block": blocks}
        if i_level != len(cfg.ch_mult) - 1:
            level["downsample"] = conv_init(next(ks), 3, 3, block_in, block_in)
        down.append(level)
    enc["down"] = down
    enc["mid"] = {
        "block_1": init_resnet_block(next(ks), block_in, block_in),
        "attn_1": init_attn_block(next(ks), block_in),
        "block_2": init_resnet_block(next(ks), block_in, block_in),
    }
    z_out = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
    enc["norm_out"] = norm_init(block_in)
    enc["conv_out"] = conv_init(next(ks), 3, 3, block_in, z_out)

    # ---- decoder
    block_in_d = cfg.ch * cfg.ch_mult[-1]
    dec: Dict = {"conv_in": conv_init(next(ks), 3, 3, cfg.z_channels, block_in_d)}
    dec["mid"] = {
        "block_1": init_resnet_block(next(ks), block_in_d, block_in_d),
        "attn_1": init_attn_block(next(ks), block_in_d),
        "block_2": init_resnet_block(next(ks), block_in_d, block_in_d),
    }
    up = []
    bi = block_in_d
    for i_level in reversed(range(len(cfg.ch_mult))):
        block_out = cfg.ch * cfg.ch_mult[i_level]
        blocks = []
        for _ in range(cfg.num_res_blocks + 1):
            blocks.append(init_resnet_block(next(ks), bi, block_out))
            bi = block_out
        level = {"block": blocks}
        if i_level != 0:
            level["upsample"] = conv_init(next(ks), 3, 3, bi, bi)
        up.insert(0, level)  # prepend: up[0] is the highest-res level
    dec["up"] = up
    dec["norm_out"] = norm_init(bi)
    dec["conv_out"] = conv_init(next(ks), 3, 3, bi, cfg.out_channels)

    q_in = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
    q_out = 2 * cfg.embed_dim if cfg.double_z else cfg.embed_dim
    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": conv_init(next(ks), 1, 1, q_in, q_out),
        "post_quant_conv": conv_init(next(ks), 1, 1, cfg.embed_dim, cfg.z_channels),
    }


class DiagonalGaussian:
    """DiagonalGaussianDistribution (distributions.py:24-62), jax flavor."""

    def __init__(self, moments: jax.Array):
        mean, logvar = jnp.split(moments, 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)

    def sample(self, key) -> jax.Array:
        return self.mean + self.std * jax.random.normal(
            key, self.mean.shape, self.mean.dtype
        )

    def mode(self) -> jax.Array:
        return self.mean

    def kl(self) -> jax.Array:
        return 0.5 * jnp.sum(
            jnp.square(self.mean) + jnp.exp(self.logvar) - 1.0 - self.logvar,
            axis=(1, 2, 3),
        )


def vae_encode(params: dict, cfg: VAEConfig, x: jax.Array) -> DiagonalGaussian:
    """Encoder tower -> quant_conv -> DiagonalGaussian. x: (N,H,W,3) in [-1,1]."""
    assert cfg.double_z, (
        "vae_encode needs double_z (mean+logvar moments); "
        "non-KL autoencoders are out of scope"
    )
    p = params["encoder"]
    h = conv2d(x, p["conv_in"], padding=1)
    for i_level, level in enumerate(p["down"]):
        for blk in level["block"]:
            h = resnet_block_apply(blk, cfg, h)
        if "downsample" in level:
            h = _downsample(level["downsample"], h)
    h = resnet_block_apply(p["mid"]["block_1"], cfg, h)
    h = attn_block_apply(p["mid"]["attn_1"], cfg, h)
    h = resnet_block_apply(p["mid"]["block_2"], cfg, h)
    h = group_norm(h, p["norm_out"]["g"], p["norm_out"]["b"], cfg.groups, cfg.norm_eps, swish=True)
    h = conv2d(h, p["conv_out"], padding=1)
    moments = conv2d(h, params["quant_conv"], padding=0)
    return DiagonalGaussian(moments)


def vae_decode(params: dict, cfg: VAEConfig, z: jax.Array, scaled: bool = True) -> jax.Array:
    """post_quant_conv -> Decoder tower. z: (N,h,w,4).

    scaled=True means z is in LatentDiffusion units (multiply back by
    1/scale_factor first — decode_first_stage semantics).
    Returns (N, 8h, 8w, 3) in [-1, 1] (unclamped).
    """
    if scaled:
        z = z / jnp.asarray(cfg.scale_factor, z.dtype)
    p = params["decoder"]
    z = conv2d(z, params["post_quant_conv"], padding=0)
    h = conv2d(z, p["conv_in"], padding=1)
    h = resnet_block_apply(p["mid"]["block_1"], cfg, h)
    h = attn_block_apply(p["mid"]["attn_1"], cfg, h)
    h = resnet_block_apply(p["mid"]["block_2"], cfg, h)
    for i_level in reversed(range(len(cfg.ch_mult))):
        level = p["up"][i_level]
        for blk in level["block"]:
            h = resnet_block_apply(blk, cfg, h)
        if "upsample" in level:
            h = upsample_nearest_2x(h)
            h = conv2d(h, level["upsample"], padding=1)
    h = group_norm(h, p["norm_out"]["g"], p["norm_out"]["b"], cfg.groups, cfg.norm_eps, swish=True)
    return conv2d(h, p["conv_out"], padding=1)
