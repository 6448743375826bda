"""Diffusers-layout checkpoint maps (VERDICT r3 #8).

The sgm/ldm single-file layout (`model.diffusion_model.*`, openaimodel
naming) is what the reference loads; diffusers naming
(`down_blocks.{i}.resnets.{j}.*`, AutoencoderKL, HF text encoders) is the
dominant distribution format for SDXL-era checkpoints. Rather than a
second 600-line converter, this module builds an exact KEY-RENAMING view:
a config-topology-driven bijection between the two namings (generated from
the same ``encoder_plan``/``decoder_plan`` the models are built from), laid
over the diffusers-named state dict. The existing strict converters then
consume the view unchanged — read-tracking propagates to the underlying
dict, so the accounting gates (every key consumed exactly once, orphans
raise naming themselves) hold for the diffusers layout too.

Naming correspondence (public convention, e.g. diffusers'
``convert_from_ckpt`` tables — re-derived here from the topology plans):

  UNet   time_embed.{0,2}        <-> time_embedding.linear_{1,2}
         label_emb.0.{0,2}       <-> add_embedding.linear_{1,2}   (SDXL)
         input_blocks.0.0        <-> conv_in
         input_blocks.{i}.0      <-> down_blocks.{L}.resnets.{j}
         input_blocks.{i}.1      <-> down_blocks.{L}.attentions.{j}
         input_blocks.{i}.0.op   <-> down_blocks.{L}.downsamplers.0.conv
         middle_block.{0,1,2}    <-> mid_block.{resnets.0,attentions.0,resnets.1}
         output_blocks.{i}.*     <-> up_blocks.{u}.*   (same level order)
         out.{0,2}               <-> conv_norm_out / conv_out
         ResBlock: in_layers.0/2 -> norm1/conv1, emb_layers.1 ->
         time_emb_proj, out_layers.0/3 -> norm2/conv2,
         skip_connection -> conv_shortcut; transformer inner names match.

  VAE    down.{i}.block.{j}      <-> down_blocks.{i}.resnets.{j}
         up.{i}                  <-> up_blocks.{n-1-i}   (REVERSED index)
         mid.block_1/attn_1/block_2 <-> mid_block.resnets.0/attentions.0/
         resnets.1; norm_out -> conv_norm_out; nin_shortcut ->
         conv_shortcut; attention q/k/v/proj_out (1x1 convs) ->
         to_q/to_k/to_v/to_out.0 (linear — reshaped in the view).

  CLIP   diffusers text_encoder is HF ``text_model.*`` naming — already
         ``convert_clip(sd, cfg, prefix="")``; SDXL text_encoder_2
         (CLIPTextModelWithProjection) adds ``text_projection.weight``,
         stored (proj, d) for x @ W.T — transposed to the (d, proj)
         x @ W convention the OpenCLIP tree uses.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import numpy as np

from stablediffusioneo_tpu.config import CLIPTextConfig, UNetConfig, VAEConfig

__all__ = [
    "convert_clip_diffusers",
    "convert_clip_g_diffusers",
    "convert_unet_diffusers",
    "convert_vae_diffusers",
    "rename_sgm_to_diffusers",
    "sgm_view",
]

# sgm inner module name -> diffusers inner module name
_RES_INNER = {
    "in_layers.0": "norm1",
    "in_layers.2": "conv1",
    "emb_layers.1": "time_emb_proj",
    "out_layers.0": "norm2",
    "out_layers.3": "conv2",
    "skip_connection": "conv_shortcut",
}
_VAE_RES_INNER = {
    "norm1": "norm1", "conv1": "conv1", "norm2": "norm2", "conv2": "conv2",
    "nin_shortcut": "conv_shortcut",
}
_VAE_ATTN_INNER = {
    "norm": "group_norm", "q": "to_q", "k": "to_k", "v": "to_v",
    "proj_out": "to_out.0",
}


def _unet_pairs(cfg: UNetConfig):
    """(sgm_base, diffusers_base, inner_map|None) module pairs, generated
    from the same plans the model is built from (models/unet.py)."""
    from stablediffusioneo_tpu.models.unet import decoder_plan, encoder_plan

    pairs = [
        ("time_embed.0", "time_embedding.linear_1", None),
        ("time_embed.2", "time_embedding.linear_2", None),
        ("out.0", "conv_norm_out", None),
        ("out.2", "conv_out", None),
    ]
    if cfg.adm_in_channels:
        pairs += [("label_emb.0.0", "add_embedding.linear_1", None),
                  ("label_emb.0.2", "add_embedding.linear_2", None)]
    level = j = 0
    for i, desc in enumerate(encoder_plan(cfg)):
        if desc["kind"] == "conv":
            pairs.append((f"input_blocks.{i}.0", "conv_in", None))
        elif desc["kind"] == "down":
            pairs.append((f"input_blocks.{i}.0.op",
                          f"down_blocks.{level}.downsamplers.0.conv", None))
            level, j = level + 1, 0
        else:
            pairs.append((f"input_blocks.{i}.0",
                          f"down_blocks.{level}.resnets.{j}", _RES_INNER))
            if desc["attn"]:
                pairs.append((f"input_blocks.{i}.1",
                              f"down_blocks.{level}.attentions.{j}", None))
            j += 1
    pairs += [
        ("middle_block.0", "mid_block.resnets.0", _RES_INNER),
        ("middle_block.1", "mid_block.attentions.0", None),
        ("middle_block.2", "mid_block.resnets.1", _RES_INNER),
    ]
    u = j = 0
    for i, desc in enumerate(decoder_plan(cfg)):
        pairs.append((f"output_blocks.{i}.0",
                      f"up_blocks.{u}.resnets.{j}", _RES_INNER))
        up_idx = 1
        if desc["attn"]:
            pairs.append((f"output_blocks.{i}.1",
                          f"up_blocks.{u}.attentions.{j}", None))
            up_idx = 2
        if desc["up"]:
            pairs.append((f"output_blocks.{i}.{up_idx}.conv",
                          f"up_blocks.{u}.upsamplers.0.conv", None))
        j += 1
        if j == cfg.num_res_blocks + 1:
            u, j = u + 1, 0
    return pairs


def _vae_pairs(cfg: VAEConfig):
    n = len(cfg.ch_mult)
    pairs = [
        ("quant_conv", "quant_conv", None),
        ("post_quant_conv", "post_quant_conv", None),
    ]
    for tower in ("encoder", "decoder"):
        pairs += [
            (f"{tower}.conv_in", f"{tower}.conv_in", None),
            (f"{tower}.norm_out", f"{tower}.conv_norm_out", None),
            (f"{tower}.conv_out", f"{tower}.conv_out", None),
            (f"{tower}.mid.block_1", f"{tower}.mid_block.resnets.0",
             _VAE_RES_INNER),
            (f"{tower}.mid.attn_1", f"{tower}.mid_block.attentions.0",
             _VAE_ATTN_INNER),
            (f"{tower}.mid.block_2", f"{tower}.mid_block.resnets.1",
             _VAE_RES_INNER),
        ]
    for i in range(n):
        for j in range(cfg.num_res_blocks):
            pairs.append((f"encoder.down.{i}.block.{j}",
                          f"encoder.down_blocks.{i}.resnets.{j}",
                          _VAE_RES_INNER))
        if i != n - 1:
            pairs.append((f"encoder.down.{i}.downsample.conv",
                          f"encoder.down_blocks.{i}.downsamplers.0.conv",
                          None))
    for i in range(n):  # ldm up.{i} <-> diffusers up_blocks.{n-1-i}
        for j in range(cfg.num_res_blocks + 1):
            pairs.append((f"decoder.up.{i}.block.{j}",
                          f"decoder.up_blocks.{n - 1 - i}.resnets.{j}",
                          _VAE_RES_INNER))
        if i != 0:
            pairs.append((f"decoder.up.{i}.upsample.conv",
                          f"decoder.up_blocks.{n - 1 - i}.upsamplers.0.conv",
                          None))
    return pairs


def _expand(keys, pairs, reverse: bool = False) -> Dict[str, str]:
    """Full key->key map for the given key set. Forward: diffusers keys in,
    {sgm_key: diffusers_key} out. reverse=True: sgm keys in,
    {sgm_key: diffusers_key} out (same orientation, matched from the sgm
    side) — used to synthesize diffusers dicts from sgm-named ones."""
    by_base = []
    for sgm_b, diff_b, inner in pairs:
        from_b = sgm_b if reverse else diff_b
        inner_map = None
        if inner is not None:
            inner_map = inner if reverse else {v: k for k, v in inner.items()}
        by_base.append((from_b, sgm_b, diff_b, inner_map))
    by_base.sort(key=lambda t: -len(t[0]))

    out: Dict[str, str] = {}
    for key in keys:
        for from_b, sgm_b, diff_b, inner_map in by_base:
            if not (key == from_b or key.startswith(from_b + ".")):
                continue
            rem = key[len(from_b):].lstrip(".")
            if inner_map is not None and rem:
                mod, _, leaf = rem.rpartition(".")
                to_mod = inner_map.get(mod)
                if to_mod is None:
                    continue  # not this base (e.g. ambiguous prefix)
                rem_sgm = f"{mod if reverse else to_mod}.{leaf}"
                rem_diff = f"{to_mod if reverse else mod}.{leaf}"
            else:
                rem_sgm = rem_diff = rem
            sgm_key = f"{sgm_b}.{rem_sgm}" if rem_sgm else sgm_b
            diff_key = f"{diff_b}.{rem_diff}" if rem_diff else diff_b
            out[sgm_key] = diff_key
            break
    return out


class _SgmView(Mapping):
    """sgm-named read view over a diffusers-named state dict. Reads pass
    through to the underlying mapping (read-tracking intact); per-key value
    transforms handle the few layout differences (VAE attention linears
    <-> 1x1 convs)."""

    def __init__(self, sd: Mapping, key_map: Dict[str, str], transforms=()):
        self._sd = sd
        self._map = key_map
        self._tr = set(transforms)

    def __getitem__(self, k):
        v = self._sd[self._map[k]]
        if k in self._tr and getattr(v, "ndim", 0) == 2:
            # diffusers stores VAE mid-attention q/k/v/proj as nn.Linear
            # (C, C); the ldm modules are 1x1 convs (C, C, 1, 1)
            v = np.asarray(v).reshape(*v.shape, 1, 1)
        return v

    def __iter__(self):
        return iter(self._map)

    def __len__(self):
        return len(self._map)

    def __contains__(self, k):
        return k in self._map


def _vae_attn_transform_keys(key_map: Dict[str, str]):
    return {k for k in key_map
            if ".attn_1." in k and k.endswith(".weight")}


def sgm_view(sd: Mapping, cfg, component: str) -> Mapping:
    """sgm-named view over a diffusers-named ``unet`` or ``vae`` dict."""
    if component == "unet":
        km = _expand(sd, _unet_pairs(cfg))
        return _SgmView(sd, km)
    if component == "vae":
        km = _expand(sd, _vae_pairs(cfg))
        return _SgmView(sd, km, _vae_attn_transform_keys(km))
    raise ValueError(f"unknown component {component!r}")


def rename_sgm_to_diffusers(sd: Mapping, cfg, component: str) -> Dict:
    """Eagerly rename an sgm-named dict to diffusers naming (tests /
    export). VAE attention convs are flattened to the linear layout."""
    pairs = _unet_pairs(cfg) if component == "unet" else _vae_pairs(cfg)
    km = _expand(sd, pairs, reverse=True)
    unmapped = set(sd) - set(km)
    if unmapped:
        raise KeyError(f"sgm keys with no diffusers name: "
                       f"{sorted(unmapped)[:6]}")
    tr = _vae_attn_transform_keys(km) if component == "vae" else set()
    out = {}
    for sgm_k, diff_k in km.items():
        v = sd[sgm_k]
        if sgm_k in tr and getattr(v, "ndim", 0) == 4:
            v = np.asarray(v).reshape(v.shape[0], v.shape[1])
        out[diff_k] = v
    return out


# ------------------------------------------------------------- converters


def convert_unet_diffusers(sd: Mapping, cfg: UNetConfig, dtype=None) -> Dict:
    """Diffusers-named UNet2DConditionModel state dict -> the same JAX
    tree ``convert_unet`` builds from the sgm layout."""
    from stablediffusioneo_tpu.checkpoint.convert import convert_unet

    return convert_unet(sgm_view(sd, cfg, "unet"), cfg, prefix="",
                        dtype=dtype)


def convert_vae_diffusers(sd: Mapping, cfg: VAEConfig, dtype=None) -> Dict:
    """Diffusers-named AutoencoderKL state dict -> the ``convert_vae``
    tree."""
    from stablediffusioneo_tpu.checkpoint.convert import convert_vae

    return convert_vae(sgm_view(sd, cfg, "vae"), cfg, prefix="",
                       dtype=dtype)


def convert_clip_diffusers(sd: Mapping, cfg: CLIPTextConfig,
                           dtype=None) -> Dict:
    """Diffusers ``text_encoder`` is HF CLIPTextModel naming already."""
    from stablediffusioneo_tpu.checkpoint.convert import convert_clip

    return convert_clip(sd, cfg, prefix="", dtype=dtype)


def convert_clip_g_diffusers(sd: Mapping, cfg: CLIPTextConfig,
                             dtype=None) -> Dict:
    """SDXL diffusers ``text_encoder_2`` (HF CLIPTextModelWithProjection:
    text_model.* + text_projection.weight) -> the clip_g tree
    ``convert_openclip_text`` builds from the sgm layout. HF stores the
    projection (proj, d) applied as x @ W.T; the tree keeps the OpenCLIP
    (d, proj) x @ W convention."""
    import jax.numpy as jnp

    from stablediffusioneo_tpu.checkpoint.convert import convert_clip

    params = convert_clip(sd, cfg, prefix="", dtype=dtype)
    params["text_projection"] = {
        "w": jnp.asarray(np.transpose(sd["text_projection.weight"]), dtype)}
    return params
