"""Torch reference modules for parity testing.

Faithful (but minimal) torch re-implementations of the SD-1.5 /ControlNet
architecture with state_dict key names IDENTICAL to the original
checkpoints (openaimodel.py / cldm.py / VAE model.py naming). They play the
role the reference repo's `onnxruntime_check` + `_beifen` A/B modules play
(export_onnx_all.py:60-100, ldm/modules/test_mudules.py:174-200): an
independent executor that the JAX implementation must match, and a
generator of realistically-named state dicts for the converter tests.

NOT used by the framework itself — tests only.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(timesteps, dim, max_period=10000):
    half = dim // 2
    freqs = torch.exp(
        -math.log(max_period)
        * torch.arange(start=0, end=half, dtype=torch.float32)
        / half
    )
    args = timesteps[:, None].float() * freqs[None]
    emb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    return emb


class CrossAttention(nn.Module):
    def __init__(self, query_dim, context_dim=None, heads=8):
        super().__init__()
        inner_dim = query_dim
        context_dim = context_dim or query_dim
        self.heads = heads
        self.scale = (query_dim // heads) ** -0.5
        self.to_q = nn.Linear(query_dim, inner_dim, bias=False)
        self.to_k = nn.Linear(context_dim, inner_dim, bias=False)
        self.to_v = nn.Linear(context_dim, inner_dim, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner_dim, query_dim), nn.Dropout(0.0))

    def forward(self, x, context=None):
        h = self.heads
        q = self.to_q(x)
        context = context if context is not None else x
        k = self.to_k(context)
        v = self.to_v(context)
        b, tq, c = q.shape
        tk = k.shape[1]
        hd = c // h
        q = q.view(b, tq, h, hd).transpose(1, 2)
        k = k.view(b, tk, h, hd).transpose(1, 2)
        v = v.view(b, tk, h, hd).transpose(1, 2)
        sim = torch.einsum("bhid,bhjd->bhij", q, k) * self.scale
        attn = sim.softmax(dim=-1)
        out = torch.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(1, 2).reshape(b, tq, c)
        return self.to_out(out)


class GEGLU(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2)

    def forward(self, x):
        x, gate = self.proj(x).chunk(2, dim=-1)
        return x * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        inner = dim * mult
        self.net = nn.Sequential(GEGLU(dim, inner), nn.Dropout(0.0), nn.Linear(inner, dim))

    def forward(self, x):
        return self.net(x)


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, heads, context_dim):
        super().__init__()
        self.attn1 = CrossAttention(dim, heads=heads)
        self.ff = FeedForward(dim)
        self.attn2 = CrossAttention(dim, context_dim=context_dim, heads=heads)
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.norm3 = nn.LayerNorm(dim)

    def forward(self, x, context=None):
        x = self.attn1(self.norm1(x)) + x
        x = self.attn2(self.norm2(x), context=context) + x
        x = self.ff(self.norm3(x)) + x
        return x


class SpatialTransformer(nn.Module):
    def __init__(self, in_channels, heads, depth, context_dim, groups=32):
        super().__init__()
        self.norm = nn.GroupNorm(groups, in_channels, eps=1e-6, affine=True)
        self.proj_in = nn.Conv2d(in_channels, in_channels, 1)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(in_channels, heads, context_dim) for _ in range(depth)]
        )
        self.proj_out = nn.Conv2d(in_channels, in_channels, 1)

    def forward(self, x, context=None):
        b, c, h, w = x.shape
        x_in = x
        x = self.norm(x)
        x = self.proj_in(x)
        x = x.permute(0, 2, 3, 1).reshape(b, h * w, c)
        for block in self.transformer_blocks:
            x = block(x, context=context)
        x = x.reshape(b, h, w, c).permute(0, 3, 1, 2)
        x = self.proj_out(x)
        return x + x_in


class ResBlock(nn.Module):
    def __init__(self, channels, emb_channels, out_channels, groups=32):
        super().__init__()
        self.in_layers = nn.Sequential(
            nn.GroupNorm(groups, channels), nn.SiLU(), nn.Conv2d(channels, out_channels, 3, padding=1)
        )
        self.emb_layers = nn.Sequential(nn.SiLU(), nn.Linear(emb_channels, out_channels))
        self.out_layers = nn.Sequential(
            nn.GroupNorm(groups, out_channels),
            nn.SiLU(),
            nn.Dropout(0.0),
            nn.Conv2d(out_channels, out_channels, 3, padding=1),
        )
        if channels != out_channels:
            self.skip_connection = nn.Conv2d(channels, out_channels, 1)
        else:
            self.skip_connection = nn.Identity()

    def forward(self, x, emb):
        h = self.in_layers(x)
        emb_out = self.emb_layers(emb)
        h = h + emb_out[:, :, None, None]
        h = self.out_layers(h)
        return self.skip_connection(x) + h


class Downsample(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.op = nn.Conv2d(channels, channels, 3, stride=2, padding=1)

    def forward(self, x, *a):
        return self.op(x)


class Upsample(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.conv = nn.Conv2d(channels, channels, 3, padding=1)

    def forward(self, x):
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        return self.conv(x)


class TimestepEmbedSequential(nn.Sequential):
    def forward(self, x, emb, context=None):
        for layer in self:
            if isinstance(layer, ResBlock):
                x = layer(x, emb)
            elif isinstance(layer, SpatialTransformer):
                x = layer(x, context)
            elif isinstance(layer, Downsample):
                x = layer(x)
            else:
                x = layer(x)
        return x


def _cfg_tuple(cfg):
    """Pull the fields we need from a stablediffusioneo_tpu UNetConfig."""
    return (
        cfg.in_channels,
        cfg.out_channels,
        cfg.model_channels,
        tuple(cfg.channel_mult),
        cfg.num_res_blocks,
        set(cfg.attention_resolutions),
        cfg.transformer_depth,
        cfg.context_dim,
        cfg.num_heads,
        cfg.groups,
    )


class TorchUNet(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        (cin, cout_model, mc, mult, nrb, attn_ds, depth, ctx, heads, groups) = _cfg_tuple(cfg)
        hf = cfg.heads_for  # num_head_channels-aware (SD-2.x per-block heads)
        emb_dim = mc * 4
        self.model_channels = mc
        self.time_embed = nn.Sequential(
            nn.Linear(mc, emb_dim), nn.SiLU(), nn.Linear(emb_dim, emb_dim)
        )
        if getattr(cfg, "adm_in_channels", None):
            # nested Sequential: real SDXL checkpoints name the MLP
            # label_emb.0.0 / label_emb.0.2 (openaimodel wraps it once)
            self.label_emb = nn.Sequential(nn.Sequential(
                nn.Linear(cfg.adm_in_channels, emb_dim), nn.SiLU(),
                nn.Linear(emb_dim, emb_dim)))
        df = cfg.depth_for  # per-level transformer depth (SDXL)
        self.input_blocks = nn.ModuleList(
            [TimestepEmbedSequential(nn.Conv2d(cin, mc, 3, padding=1))]
        )
        ch = mc
        ds = 1
        chs = [mc]
        for level, m in enumerate(mult):
            for _ in range(nrb):
                layers = [ResBlock(ch, emb_dim, m * mc, groups)]
                ch = m * mc
                if ds in attn_ds and df(level) > 0:
                    layers.append(SpatialTransformer(ch, hf(ch), df(level), ctx, groups))
                self.input_blocks.append(TimestepEmbedSequential(*layers))
                chs.append(ch)
            if level != len(mult) - 1:
                self.input_blocks.append(TimestepEmbedSequential(Downsample(ch)))
                chs.append(ch)
                ds *= 2
        self.middle_block = TimestepEmbedSequential(
            ResBlock(ch, emb_dim, ch, groups),
            SpatialTransformer(ch, hf(ch), df(len(mult) - 1), ctx, groups),
            ResBlock(ch, emb_dim, ch, groups),
        )
        self.output_blocks = nn.ModuleList()
        for level, m in reversed(list(enumerate(mult))):
            for i in range(nrb + 1):
                ich = chs.pop()
                layers = [ResBlock(ch + ich, emb_dim, m * mc, groups)]
                ch = m * mc
                if ds in attn_ds and df(level) > 0:
                    layers.append(SpatialTransformer(ch, hf(ch), df(level), ctx, groups))
                if level != 0 and i == nrb:
                    layers.append(Upsample(ch))
                    ds //= 2
                self.output_blocks.append(TimestepEmbedSequential(*layers))
        self.out = nn.Sequential(
            nn.GroupNorm(groups, ch), nn.SiLU(), nn.Conv2d(ch, cout_model, 3, padding=1)
        )

    def forward(self, x, timesteps, context, control=None,
                only_mid_control=False, y=None):
        t_emb = timestep_embedding(timesteps, self.model_channels)
        emb = self.time_embed(t_emb)
        if y is not None:
            emb = emb + self.label_emb(y)
        hs = []
        h = x
        for module in self.input_blocks:
            h = module(h, emb, context)
            hs.append(h)
        h = self.middle_block(h, emb, context)
        if control is not None:
            control = list(control)
            h = h + control.pop()
        for module in self.output_blocks:
            if control is None or only_mid_control:
                h = torch.cat([h, hs.pop()], dim=1)
            else:
                h = torch.cat([h, hs.pop() + control.pop()], dim=1)
            h = module(h, emb, context)
        return self.out(h)


class TorchControlNet(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        ucfg = cfg.unet
        (cin, _, mc, mult, nrb, attn_ds, depth, ctx, heads, groups) = _cfg_tuple(ucfg)
        hf = ucfg.heads_for
        emb_dim = mc * 4
        self.model_channels = mc
        self.time_embed = nn.Sequential(
            nn.Linear(mc, emb_dim), nn.SiLU(), nn.Linear(emb_dim, emb_dim)
        )
        if getattr(ucfg, "adm_in_channels", None):
            self.label_emb = nn.Sequential(nn.Sequential(
                nn.Linear(ucfg.adm_in_channels, emb_dim), nn.SiLU(),
                nn.Linear(emb_dim, emb_dim)))
        dfc = ucfg.depth_for
        hc = cfg.hint_channels
        self.input_hint_block = nn.Sequential(
            nn.Conv2d(hc, 16, 3, padding=1), nn.SiLU(),
            nn.Conv2d(16, 16, 3, padding=1), nn.SiLU(),
            nn.Conv2d(16, 32, 3, padding=1, stride=2), nn.SiLU(),
            nn.Conv2d(32, 32, 3, padding=1), nn.SiLU(),
            nn.Conv2d(32, 96, 3, padding=1, stride=2), nn.SiLU(),
            nn.Conv2d(96, 96, 3, padding=1), nn.SiLU(),
            nn.Conv2d(96, 256, 3, padding=1, stride=2), nn.SiLU(),
            nn.Conv2d(256, mc, 3, padding=1),
        )
        self.input_blocks = nn.ModuleList(
            [TimestepEmbedSequential(nn.Conv2d(cin, mc, 3, padding=1))]
        )
        self.zero_convs = nn.ModuleList([TimestepEmbedSequential(nn.Conv2d(mc, mc, 1))])
        ch = mc
        ds = 1
        for level, m in enumerate(mult):
            for _ in range(nrb):
                layers = [ResBlock(ch, emb_dim, m * mc, groups)]
                ch = m * mc
                if ds in attn_ds and dfc(level) > 0:
                    layers.append(SpatialTransformer(ch, hf(ch), dfc(level), ctx, groups))
                self.input_blocks.append(TimestepEmbedSequential(*layers))
                self.zero_convs.append(TimestepEmbedSequential(nn.Conv2d(ch, ch, 1)))
            if level != len(mult) - 1:
                self.input_blocks.append(TimestepEmbedSequential(Downsample(ch)))
                self.zero_convs.append(TimestepEmbedSequential(nn.Conv2d(ch, ch, 1)))
                ds *= 2
        self.middle_block = TimestepEmbedSequential(
            ResBlock(ch, emb_dim, ch, groups),
            SpatialTransformer(ch, hf(ch), dfc(len(mult) - 1), ctx, groups),
            ResBlock(ch, emb_dim, ch, groups),
        )
        self.middle_block_out = TimestepEmbedSequential(nn.Conv2d(ch, ch, 1))

    def forward(self, x, hint, timesteps, context, y=None):
        t_emb = timestep_embedding(timesteps, self.model_channels)
        emb = self.time_embed(t_emb)
        if y is not None:
            emb = emb + self.label_emb(y)
        guided_hint = self.input_hint_block(hint)
        outs = []
        h = x
        for module, zero_conv in zip(self.input_blocks, self.zero_convs):
            h = module(h, emb, context)
            if guided_hint is not None:
                h = h + guided_hint
                guided_hint = None
            outs.append(zero_conv(h, emb, context))
        h = self.middle_block(h, emb, context)
        outs.append(self.middle_block_out(h, emb, context))
        return outs


# ------------------------------------------------------------------- VAE


def Normalize(c, groups=32):
    return nn.GroupNorm(groups, c, eps=1e-6, affine=True)


class VAEResnetBlock(nn.Module):
    def __init__(self, cin, cout, groups=32):
        super().__init__()
        self.norm1 = Normalize(cin, groups)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = Normalize(cout, groups)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.nin_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "nin_shortcut"):
            x = self.nin_shortcut(x)
        return x + h


class VAEAttnBlock(nn.Module):
    def __init__(self, c, groups=32):
        super().__init__()
        self.norm = Normalize(c, groups)
        self.q = nn.Conv2d(c, c, 1)
        self.k = nn.Conv2d(c, c, 1)
        self.v = nn.Conv2d(c, c, 1)
        self.proj_out = nn.Conv2d(c, c, 1)

    def forward(self, x):
        h_ = self.norm(x)
        q, k, v = self.q(h_), self.k(h_), self.v(h_)
        b, c, h, w = q.shape
        q = q.reshape(b, c, h * w).permute(0, 2, 1)
        k = k.reshape(b, c, h * w)
        w_ = torch.bmm(q, k) * (c ** -0.5)
        w_ = F.softmax(w_, dim=2)
        v = v.reshape(b, c, h * w)
        h_ = torch.bmm(v, w_.permute(0, 2, 1)).reshape(b, c, h, w)
        return x + self.proj_out(h_)


class VAEDown(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class VAEUp(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class TorchVAE(nn.Module):
    """Encoder+Decoder+quant convs with first_stage_model-compatible names."""

    def __init__(self, cfg):
        super().__init__()
        ch, mult, nrb, groups = cfg.ch, cfg.ch_mult, cfg.num_res_blocks, cfg.groups
        z = cfg.z_channels

        enc = nn.Module()
        enc.conv_in = nn.Conv2d(cfg.in_channels, ch, 3, padding=1)
        enc.down = nn.ModuleList()
        bi = ch
        for i, m in enumerate(mult):
            level = nn.Module()
            level.block = nn.ModuleList()
            for _ in range(nrb):
                level.block.append(VAEResnetBlock(bi, ch * m, groups))
                bi = ch * m
            if i != len(mult) - 1:
                level.downsample = VAEDown(bi)
            enc.down.append(level)
        enc.mid = nn.Module()
        enc.mid.block_1 = VAEResnetBlock(bi, bi, groups)
        enc.mid.attn_1 = VAEAttnBlock(bi, groups)
        enc.mid.block_2 = VAEResnetBlock(bi, bi, groups)
        enc.norm_out = Normalize(bi, groups)
        enc.conv_out = nn.Conv2d(bi, 2 * z if cfg.double_z else z, 3, padding=1)
        self.encoder = enc

        dec = nn.Module()
        bi = ch * mult[-1]
        dec.conv_in = nn.Conv2d(z, bi, 3, padding=1)
        dec.mid = nn.Module()
        dec.mid.block_1 = VAEResnetBlock(bi, bi, groups)
        dec.mid.attn_1 = VAEAttnBlock(bi, groups)
        dec.mid.block_2 = VAEResnetBlock(bi, bi, groups)
        up = [None] * len(mult)
        for i in reversed(range(len(mult))):
            level = nn.Module()
            level.block = nn.ModuleList()
            for _ in range(nrb + 1):
                level.block.append(VAEResnetBlock(bi, ch * mult[i], groups))
                bi = ch * mult[i]
            if i != 0:
                level.upsample = VAEUp(bi)
            up[i] = level
        dec.up = nn.ModuleList(up)
        dec.norm_out = Normalize(bi, groups)
        dec.conv_out = nn.Conv2d(bi, cfg.out_channels, 3, padding=1)
        self.decoder = dec

        qin = 2 * z if cfg.double_z else z
        qout = 2 * cfg.embed_dim if cfg.double_z else cfg.embed_dim
        self.quant_conv = nn.Conv2d(qin, qout, 1)
        self.post_quant_conv = nn.Conv2d(cfg.embed_dim, z, 1)

    def encode_moments(self, x):
        h = self.encoder.conv_in(x)
        for level in self.encoder.down:
            for blk in level.block:
                h = blk(h)
            if hasattr(level, "downsample"):
                h = level.downsample(h)
        h = self.encoder.mid.block_1(h)
        h = self.encoder.mid.attn_1(h)
        h = self.encoder.mid.block_2(h)
        h = self.encoder.conv_out(F.silu(self.encoder.norm_out(h)))
        return self.quant_conv(h)

    def decode(self, z):
        h = self.post_quant_conv(z)
        h = self.decoder.conv_in(h)
        h = self.decoder.mid.block_1(h)
        h = self.decoder.mid.attn_1(h)
        h = self.decoder.mid.block_2(h)
        for i in reversed(range(len(self.decoder.up))):
            level = self.decoder.up[i]
            for blk in level.block:
                h = blk(h)
            if hasattr(level, "upsample"):
                h = level.upsample(h)
        return self.decoder.conv_out(F.silu(self.decoder.norm_out(h)))


def state_dict_numpy(module: nn.Module) -> dict:
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}
