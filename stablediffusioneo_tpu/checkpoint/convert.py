"""torch state-dict -> JAX param-tree key mapping for the four CNSD models.

Layout rules (fixed framework-wide, see ops/layers.py):
  conv   torch OIHW (O,I,kH,kW)  ->  HWIO (kH,kW,I,O)
  linear torch (out,in)          ->  (in,out)
  norm   weight/bias             ->  g/b

Checkpoint naming follows the original ControlNet `control_sd15_*.pth`
full-model state dict:
  model.diffusion_model.*   -> UNet        (openaimodel.py naming)
  control_model.*           -> ControlNet  (cldm/cldm.py naming)
  first_stage_model.*       -> VAE         (model.py naming)
  cond_stage_model.transformer.* -> CLIP   (HF CLIPTextModel naming)
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

from stablediffusioneo_tpu.config import (
    CLIPTextConfig,
    ControlNetConfig,
    PipelineConfig,
    UNetConfig,
    VAEConfig,
)
from stablediffusioneo_tpu.models.unet import decoder_plan, encoder_plan


def _conv(sd, name, dtype=None):
    w = np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0))  # OIHW -> HWIO
    p = {"w": jnp.asarray(w, dtype)}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{name}.bias"], dtype)
    return p


def _linear(sd, name, dtype=None):
    p = {"w": jnp.asarray(np.transpose(sd[f"{name}.weight"]), dtype)}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{name}.bias"], dtype)
    return p


def _norm(sd, name, dtype=None):
    return {
        "g": jnp.asarray(sd[f"{name}.weight"], dtype),
        "b": jnp.asarray(sd[f"{name}.bias"], dtype),
    }


def _strip(sd, prefix: str):
    """Prefix-stripping *view* (not a copy): keeps read accounting alive when
    `sd` is a checkpoint.accounting.TrackedStateDict."""
    from stablediffusioneo_tpu.checkpoint.accounting import PrefixView

    return PrefixView(sd, prefix)


# ------------------------------------------------------------------- UNet


def _resblock(sd, base, dtype):
    p = {
        "norm1": _norm(sd, f"{base}.in_layers.0", dtype),
        "conv1": _conv(sd, f"{base}.in_layers.2", dtype),
        "emb": _linear(sd, f"{base}.emb_layers.1", dtype),
        "norm2": _norm(sd, f"{base}.out_layers.0", dtype),
        "conv2": _conv(sd, f"{base}.out_layers.3", dtype),
    }
    if f"{base}.skip_connection.weight" in sd:
        p["skip"] = _conv(sd, f"{base}.skip_connection", dtype)
    return p


def _spatial_transformer(sd, base, depth, dtype):
    blocks = []
    for j in range(depth):
        tb = f"{base}.transformer_blocks.{j}"
        blocks.append(
            {
                "norm1": _norm(sd, f"{tb}.norm1", dtype),
                "attn1": {
                    "wq": _linear(sd, f"{tb}.attn1.to_q", dtype),
                    "wk": _linear(sd, f"{tb}.attn1.to_k", dtype),
                    "wv": _linear(sd, f"{tb}.attn1.to_v", dtype),
                    "wo": _linear(sd, f"{tb}.attn1.to_out.0", dtype),
                },
                "norm2": _norm(sd, f"{tb}.norm2", dtype),
                "attn2": {
                    "wq": _linear(sd, f"{tb}.attn2.to_q", dtype),
                    "wk": _linear(sd, f"{tb}.attn2.to_k", dtype),
                    "wv": _linear(sd, f"{tb}.attn2.to_v", dtype),
                    "wo": _linear(sd, f"{tb}.attn2.to_out.0", dtype),
                },
                "norm3": _norm(sd, f"{tb}.norm3", dtype),
                "ff1": _linear(sd, f"{tb}.ff.net.0.proj", dtype),
                "ff2": _linear(sd, f"{tb}.ff.net.2", dtype),
            }
        )
    return {
        "norm": _norm(sd, f"{base}.norm", dtype),
        "proj_in": _proj_conv(sd, f"{base}.proj_in", dtype),
        "blocks": blocks,
        "proj_out": _proj_conv(sd, f"{base}.proj_out", dtype),
    }


def _proj_conv(sd, name, dtype=None):
    """SpatialTransformer proj_in/out: 1x1 conv (SD-1.x) or Linear (SD-2.x
    use_linear_in_transformer) — a Linear IS a 1x1 conv, so 2D weights are
    reshaped into the conv representation."""
    w = sd[f"{name}.weight"]
    if w.ndim == 2:
        w = np.transpose(w)[None, None]
    else:
        w = np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO
    p = {"w": jnp.asarray(w, dtype)}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{name}.bias"], dtype)
    return p


def _unet_encoder_part(sd, cfg: UNetConfig, dtype) -> Dict:
    """time_embed + input_blocks + middle_block (shared by UNet & ControlNet)."""
    params: Dict = {
        "time_embed": {
            "l1": _linear(sd, "time_embed.0", dtype),
            "l2": _linear(sd, "time_embed.2", dtype),
        }
    }
    blocks = []
    for i, desc in enumerate(encoder_plan(cfg)):
        base = f"input_blocks.{i}"
        if desc["kind"] == "conv":
            blocks.append({"conv": _conv(sd, f"{base}.0", dtype)})
        elif desc["kind"] == "down":
            blocks.append({"down": _conv(sd, f"{base}.0.op", dtype)})
        else:
            b = {"res": _resblock(sd, f"{base}.0", dtype)}
            if desc["attn"]:
                b["attn"] = _spatial_transformer(
                    sd, f"{base}.1", desc["depth"], dtype
                )
            blocks.append(b)
    params["input_blocks"] = blocks
    if cfg.adm_in_channels:
        # SDXL ADM conditioning MLP (label_emb.0 is a Sequential-in-list).
        # Index directly: an ADM-configured model with the keys missing is
        # a broken checkpoint and must fail HERE, not as a KeyError deep
        # inside the first sampling trace.
        params["label_emb"] = {
            "l1": _linear(sd, "label_emb.0.0", dtype),
            "l2": _linear(sd, "label_emb.0.2", dtype),
        }
    params["middle_block"] = {
        "res1": _resblock(sd, "middle_block.0", dtype),
        "attn": _spatial_transformer(
            sd, "middle_block.1",
            cfg.depth_for(len(cfg.channel_mult) - 1), dtype),
        "res2": _resblock(sd, "middle_block.2", dtype),
    }
    return params


def convert_unet(
    sd: Dict[str, np.ndarray],
    cfg: UNetConfig,
    prefix: str = "model.diffusion_model.",
    dtype=None,
) -> Dict:
    """Map an openaimodel UNetModel state dict onto the JAX UNet tree."""
    sd = _strip(sd, prefix) if prefix else sd
    params = _unet_encoder_part(sd, cfg, dtype)

    out_blocks = []
    for i, desc in enumerate(decoder_plan(cfg)):
        base = f"output_blocks.{i}"
        b = {"res": _resblock(sd, f"{base}.0", dtype)}
        up_idx = 1
        if desc["attn"]:
            b["attn"] = _spatial_transformer(sd, f"{base}.1", desc["depth"], dtype)
            up_idx = 2
        if desc["up"]:
            b["up"] = _conv(sd, f"{base}.{up_idx}.conv", dtype)
        out_blocks.append(b)
    params["output_blocks"] = out_blocks

    params["out"] = {
        "norm": _norm(sd, "out.0", dtype),
        "conv": _conv(sd, "out.2", dtype),
    }
    return params


# --------------------------------------------------------------- ControlNet


def convert_controlnet(
    sd: Dict[str, np.ndarray],
    cfg: ControlNetConfig,
    prefix: str = "control_model.",
    dtype=None,
) -> Dict:
    sd = _strip(sd, prefix) if prefix else sd
    # the encoder part shares UNet naming
    unet_part = _unet_encoder_part(sd, cfg.unet, dtype)
    n_blocks = len(encoder_plan(cfg.unet))
    hint = []
    # hint block Sequential indices: convs at 0,2,4,6,8,10,12,14 (SiLU between)
    for idx in range(0, 16, 2):
        hint.append(_conv(sd, f"input_hint_block.{idx}", dtype))
    out = {
        "time_embed": unet_part["time_embed"],
        "input_blocks": unet_part["input_blocks"],
        "middle_block": unet_part["middle_block"],
        "input_hint_block": hint,
        "zero_convs": [
            _conv(sd, f"zero_convs.{i}.0", dtype) for i in range(n_blocks)
        ],
        "middle_block_out": _conv(sd, "middle_block_out.0", dtype),
    }
    if "label_emb" in unet_part:  # SDXL-style ControlNet (ADM-conditioned)
        out["label_emb"] = unet_part["label_emb"]
    return out


# --------------------------------------------------------------------- VAE


def _vae_resnet(sd, base, dtype):
    p = {
        "norm1": _norm(sd, f"{base}.norm1", dtype),
        "conv1": _conv(sd, f"{base}.conv1", dtype),
        "norm2": _norm(sd, f"{base}.norm2", dtype),
        "conv2": _conv(sd, f"{base}.conv2", dtype),
    }
    if f"{base}.nin_shortcut.weight" in sd:
        p["nin_shortcut"] = _conv(sd, f"{base}.nin_shortcut", dtype)
    return p


def _vae_attn(sd, base, dtype):
    return {
        "norm": _norm(sd, f"{base}.norm", dtype),
        "q": _conv(sd, f"{base}.q", dtype),
        "k": _conv(sd, f"{base}.k", dtype),
        "v": _conv(sd, f"{base}.v", dtype),
        "proj_out": _conv(sd, f"{base}.proj_out", dtype),
    }


def convert_vae(
    sd: Dict[str, np.ndarray],
    cfg: VAEConfig,
    prefix: str = "first_stage_model.",
    dtype=None,
) -> Dict:
    sd = _strip(sd, prefix) if prefix else sd
    enc: Dict = {"conv_in": _conv(sd, "encoder.conv_in", dtype), "down": []}
    for i in range(len(cfg.ch_mult)):
        level = {
            "block": [
                _vae_resnet(sd, f"encoder.down.{i}.block.{j}", dtype)
                for j in range(cfg.num_res_blocks)
            ]
        }
        if f"encoder.down.{i}.downsample.conv.weight" in sd:
            level["downsample"] = _conv(sd, f"encoder.down.{i}.downsample.conv", dtype)
        enc["down"].append(level)
    enc["mid"] = {
        "block_1": _vae_resnet(sd, "encoder.mid.block_1", dtype),
        "attn_1": _vae_attn(sd, "encoder.mid.attn_1", dtype),
        "block_2": _vae_resnet(sd, "encoder.mid.block_2", dtype),
    }
    enc["norm_out"] = _norm(sd, "encoder.norm_out", dtype)
    enc["conv_out"] = _conv(sd, "encoder.conv_out", dtype)

    dec: Dict = {"conv_in": _conv(sd, "decoder.conv_in", dtype), "up": []}
    dec["mid"] = {
        "block_1": _vae_resnet(sd, "decoder.mid.block_1", dtype),
        "attn_1": _vae_attn(sd, "decoder.mid.attn_1", dtype),
        "block_2": _vae_resnet(sd, "decoder.mid.block_2", dtype),
    }
    for i in range(len(cfg.ch_mult)):
        level = {
            "block": [
                _vae_resnet(sd, f"decoder.up.{i}.block.{j}", dtype)
                for j in range(cfg.num_res_blocks + 1)
            ]
        }
        if f"decoder.up.{i}.upsample.conv.weight" in sd:
            level["upsample"] = _conv(sd, f"decoder.up.{i}.upsample.conv", dtype)
        dec["up"].append(level)
    dec["norm_out"] = _norm(sd, "decoder.norm_out", dtype)
    dec["conv_out"] = _conv(sd, "decoder.conv_out", dtype)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv", dtype),
        "post_quant_conv": _conv(sd, "post_quant_conv", dtype),
    }


# -------------------------------------------------------------------- CLIP


def convert_clip(
    sd: Dict[str, np.ndarray],
    cfg: CLIPTextConfig,
    prefix: str = "cond_stage_model.transformer.",
    dtype=None,
) -> Dict:
    sd = _strip(sd, prefix) if prefix else sd
    tm = "text_model."
    params: Dict = {
        "token_embedding": jnp.asarray(
            sd[f"{tm}embeddings.token_embedding.weight"], dtype
        ),
        "position_embedding": jnp.asarray(
            sd[f"{tm}embeddings.position_embedding.weight"], dtype
        ),
        "layers": [],
        "final_ln": _norm(sd, f"{tm}final_layer_norm", dtype),
    }
    for i in range(cfg.num_layers):
        base = f"{tm}encoder.layers.{i}"
        params["layers"].append(
            {
                "ln1": _norm(sd, f"{base}.layer_norm1", dtype),
                "q": _linear(sd, f"{base}.self_attn.q_proj", dtype),
                "k": _linear(sd, f"{base}.self_attn.k_proj", dtype),
                "v": _linear(sd, f"{base}.self_attn.v_proj", dtype),
                "out": _linear(sd, f"{base}.self_attn.out_proj", dtype),
                "ln2": _norm(sd, f"{base}.layer_norm2", dtype),
                "fc1": _linear(sd, f"{base}.mlp.fc1", dtype),
                "fc2": _linear(sd, f"{base}.mlp.fc2", dtype),
            }
        )
    return params


# --------------------------------------------------------------- full load


def load_controlnet_pipeline(
    path: str,
    cfg: Optional[PipelineConfig] = None,
    dtype=None,
    strict: bool = True,
) -> Dict[str, Dict]:
    """Load a full ControlNet checkpoint (e.g. control_sd15_canny.pth) into
    the four param trees. Equivalent of create_model + load_state_dict
    (canny2image_TRT.py:23-28).

    strict=True (default) runs key accounting: every checkpoint key must be
    consumed by exactly one converter or match a documented known-unused
    pattern (checkpoint/accounting.py SD_KNOWN_UNUSED); otherwise raises
    ConversionAccountingError naming the orphan keys. The loud-boundary
    analog of the reference's onnxruntime_check (export_onnx_all.py:60-100).
    """
    from stablediffusioneo_tpu.checkpoint.accounting import account_pipeline
    from stablediffusioneo_tpu.checkpoint.torch_reader import load_torch_state_dict
    from stablediffusioneo_tpu.config import sd15_pipeline

    cfg = cfg or sd15_pipeline()
    sd = load_torch_state_dict(path)
    if strict:
        return account_pipeline(sd, cfg, dtype=dtype).assert_complete(
            "controlnet_pipeline"
        ).tree
    return {
        "unet": convert_unet(sd, cfg.unet, dtype=dtype),
        "controlnet": convert_controlnet(sd, cfg.controlnet, dtype=dtype),
        "vae": convert_vae(sd, cfg.vae, dtype=dtype),
        "clip": convert_clip(sd, cfg.clip, dtype=dtype),
    }


def load_sdxl_pipeline(
    path: str,
    cfg=None,
    dtype=None,
    strict: bool = True,
) -> Dict[str, Dict]:
    """Load an SDXL-base checkpoint (sgm layout) into the four param trees:

      model.diffusion_model.*            -> unet   (convert_unet + label_emb)
      conditioner.embedders.0.transformer.* -> clip_l (HF CLIPTextModel naming)
      conditioner.embedders.1.model.*    -> clip_g (OpenCLIP, + text_projection)
      first_stage_model.*                -> vae

    strict=True runs per-tree key accounting (every in-scope key consumed;
    orphans raise naming themselves) + global scope coverage — keys
    outside every model scope must match SD_KNOWN_UNUSED (a foreign
    top-level tree must not load silently with its weights dropped)."""
    from stablediffusioneo_tpu.models.sdxl import SDXLConfig

    cfg = cfg or SDXLConfig()
    jobs = (
        ("unet", convert_unet, "model.diffusion_model.", cfg.unet, ()),
        ("clip_l", convert_clip, "conditioner.embedders.0.transformer.",
         cfg.clip_l, (r".*position_ids",)),
        ("clip_g", convert_openclip_text, "conditioner.embedders.1.model.",
         cfg.clip_g, (r".*attn_mask", r".*logit_scale")),
        ("vae", convert_vae, "first_stage_model.", cfg.vae, ()),
    )
    return _load_concat_family(path, jobs, dtype, strict, "sdxl")


def convert_openclip_text(
    sd: Dict[str, np.ndarray],
    cfg: CLIPTextConfig,
    prefix: str = "cond_stage_model.model.",
    dtype=None,
) -> Dict:
    """Map an OpenCLIP text tower (FrozenOpenCLIPEmbedder's inner model,
    SD-2.x checkpoints: `cond_stage_model.model.*` with packed
    attn.in_proj_{weight,bias}) onto the CLIP tree."""
    sd = _strip(sd, prefix) if prefix else sd
    params: Dict = {
        "token_embedding": jnp.asarray(sd["token_embedding.weight"], dtype),
        "position_embedding": jnp.asarray(sd["positional_embedding"], dtype),
        "layers": [],
        "final_ln": _norm(sd, "ln_final", dtype),
    }
    for i in range(cfg.num_layers):
        base = f"transformer.resblocks.{i}"
        in_w = np.transpose(sd[f"{base}.attn.in_proj_weight"])  # (d, 3d)
        in_b = sd[f"{base}.attn.in_proj_bias"]
        d = in_w.shape[0]
        qw, kw, vw = in_w[:, :d], in_w[:, d:2*d], in_w[:, 2*d:]
        qb, kb, vb = in_b[:d], in_b[d:2*d], in_b[2*d:]
        params["layers"].append(
            {
                "ln1": _norm(sd, f"{base}.ln_1", dtype),
                "q": {"w": jnp.asarray(qw, dtype), "b": jnp.asarray(qb, dtype)},
                "k": {"w": jnp.asarray(kw, dtype), "b": jnp.asarray(kb, dtype)},
                "v": {"w": jnp.asarray(vw, dtype), "b": jnp.asarray(vb, dtype)},
                "out": _linear(sd, f"{base}.attn.out_proj", dtype),
                "ln2": _norm(sd, f"{base}.ln_2", dtype),
                "fc1": _linear(sd, f"{base}.mlp.c_fc", dtype),
                "fc2": _linear(sd, f"{base}.mlp.c_proj", dtype),
            }
        )
    if "text_projection" in sd:
        # pooled-output projection (SDXL's bigG conditioner uses it; the
        # SD-2.x conditioning path doesn't, but clip_text_pooled does).
        # OpenCLIP stores it (d, proj) applied as x @ proj — keep as-is.
        params["text_projection"] = {
            "w": jnp.asarray(sd["text_projection"], dtype)}
    return params


# -------------------------------------------- concat-conditioned families


def convert_depth_tower(
    sd: Dict[str, np.ndarray],
    cfg=None,
    prefix: str = "depth_model.model.",
    dtype=None,
) -> Dict:
    """The MiDaS DPT-hybrid tower embedded in an SD-2.0 depth checkpoint
    (LatentDepth2ImageDiffusion's `depth_model` — the reference vendors the
    same net under ldm/modules/midas/). cfg is accepted for converter-API
    uniformity and unused (DPT-hybrid topology is fixed)."""
    from stablediffusioneo_tpu.annotators.midas_hybrid import convert_dpt_hybrid

    return convert_dpt_hybrid(_strip(sd, prefix) if prefix else sd,
                              dtype=dtype)


def _load_concat_family(path, jobs, dtype, strict, tag):
    """Shared strict loader: per-tree key accounting + global coverage of
    keys outside every scope (load_sdxl_pipeline semantics)."""
    from stablediffusioneo_tpu.checkpoint.accounting import (
        SD_KNOWN_UNUSED, account,
    )
    from stablediffusioneo_tpu.checkpoint.torch_reader import (
        load_torch_state_dict,
    )

    import re as _re

    sd = load_torch_state_dict(path)
    out: Dict[str, Dict] = {}
    for name, fn, prefix, sub_cfg, ignore in jobs:
        if strict:
            out[name] = account(
                fn, sd, sub_cfg, prefix=prefix, scope_prefix=prefix,
                ignore=ignore, dtype=dtype,
            ).assert_complete(f"{tag}.{name}").tree
        else:
            out[name] = fn(sd, sub_cfg, prefix=prefix, dtype=dtype)
    if strict:
        prefixes = tuple(j[2] for j in jobs)
        loose = [k for k in sd if not k.startswith(prefixes)]
        unused_re = [_re.compile(p) for p in SD_KNOWN_UNUSED]
        foreign = [k for k in loose
                   if not any(r.fullmatch(k) for r in unused_re)]
        if foreign:
            raise ValueError(
                f"load_{tag}_pipeline: {len(foreign)} key(s) outside every "
                f"model scope and not known-unused: {sorted(foreign)[:8]}")
    return out


def load_depth2img_pipeline(
    path: str,
    cfg: Optional[PipelineConfig] = None,
    dtype=None,
    strict: bool = True,
) -> Dict[str, Dict]:
    """Load an SD-2.0 depth2img checkpoint (512-depth-ema layout):

      model.diffusion_model.*   -> unet (5-channel conv_in)
      first_stage_model.*       -> vae
      cond_stage_model.model.*  -> clip (OpenCLIP ViT-H text tower)
      depth_model.model.*       -> depth (MiDaS DPT-hybrid)

    strict=True runs per-tree key accounting + global coverage; sample via
    pipeline.concat_cond (sd_concat_sample_scan + depth_to_concat)."""
    from stablediffusioneo_tpu.config import sd2_depth_pipeline

    cfg = cfg or sd2_depth_pipeline()
    jobs = (
        ("unet", convert_unet, "model.diffusion_model.", cfg.unet, ()),
        ("vae", convert_vae, "first_stage_model.", cfg.vae, ()),
        ("clip", convert_openclip_text, "cond_stage_model.model.", cfg.clip,
         (r".*attn_mask", r".*logit_scale")),
        ("depth", convert_depth_tower, "depth_model.model.", None, ()),
    )
    return _load_concat_family(path, jobs, dtype, strict, "depth2img")


def load_inpaint_pipeline(
    path: str,
    cfg: Optional[PipelineConfig] = None,
    dtype=None,
    strict: bool = True,
) -> Dict[str, Dict]:
    """Load a dedicated inpainting checkpoint (sd-v1-5-inpainting /
    SD-2.0-inpainting layout): the 9-channel UNet + vae + text tower. The
    text-encoder layout follows cfg.clip: SD-1.5 checkpoints carry the HF
    CLIPTextModel under cond_stage_model.transformer., SD-2.x the OpenCLIP
    tower under cond_stage_model.model. (selected by cfg.clip.layer ==
    "penultimate", the SD-2.x marker)."""
    from stablediffusioneo_tpu.config import sd15_inpaint_pipeline

    cfg = cfg or sd15_inpaint_pipeline()
    if cfg.clip.layer == "penultimate":
        clip_job = ("clip", convert_openclip_text, "cond_stage_model.model.",
                    cfg.clip, (r".*attn_mask", r".*logit_scale"))
    else:
        clip_job = ("clip", convert_clip, "cond_stage_model.transformer.",
                    cfg.clip, (r".*position_ids",))
    jobs = (
        ("unet", convert_unet, "model.diffusion_model.", cfg.unet, ()),
        ("vae", convert_vae, "first_stage_model.", cfg.vae, ()),
        clip_job,
    )
    return _load_concat_family(path, jobs, dtype, strict, "inpaint")


def load_sdxl_refiner_pipeline(
    path: str,
    cfg=None,
    dtype=None,
    strict: bool = True,
) -> Dict[str, Dict]:
    """Load an SDXL-refiner checkpoint (sgm layout) into three param trees:

      model.diffusion_model.*          -> unet (4-level, bigG-only context)
      conditioner.embedders.0.model.*  -> clip_g (OpenCLIP bigG; the
                                          aesthetic/size embedders 1..2 are
                                          parameter-free fourier encoders)
      first_stage_model.*              -> vae

    strict=True runs per-tree key accounting + global scope coverage.
    Sample via models.sdxl.sdxl_refine_latents on the base model's
    latents (shared VAE; no decode/re-encode between stages)."""
    from stablediffusioneo_tpu.models.sdxl import SDXLRefinerConfig

    cfg = cfg or SDXLRefinerConfig()
    jobs = (
        ("unet", convert_unet, "model.diffusion_model.", cfg.unet, ()),
        ("clip_g", convert_openclip_text, "conditioner.embedders.0.model.",
         cfg.clip_g, (r".*attn_mask", r".*logit_scale")),
        ("vae", convert_vae, "first_stage_model.", cfg.vae, ()),
    )
    return _load_concat_family(path, jobs, dtype, strict, "sdxl_refiner")


def load_sd_pipeline(
    path: str,
    cfg: Optional[PipelineConfig] = None,
    dtype=None,
    strict: bool = True,
) -> Dict[str, Dict]:
    """Load a plain (ControlNet-free) SD checkpoint — v1-5-pruned /
    SD-2.x base layouts: unet + vae + text tower, no control_model scope.
    Text-encoder layout follows cfg.clip like load_inpaint_pipeline
    (SD-1.x: HF CLIP under cond_stage_model.transformer.; SD-2.x: OpenCLIP
    under cond_stage_model.model.). Sample via
    pipeline.concat_cond.sd_txt2img_scan."""
    from stablediffusioneo_tpu.config import sd15_pipeline

    cfg = cfg or sd15_pipeline()
    if cfg.clip.layer == "penultimate":
        clip_job = ("clip", convert_openclip_text, "cond_stage_model.model.",
                    cfg.clip, (r".*attn_mask", r".*logit_scale"))
    else:
        clip_job = ("clip", convert_clip, "cond_stage_model.transformer.",
                    cfg.clip, (r".*position_ids",))
    jobs = (
        ("unet", convert_unet, "model.diffusion_model.", cfg.unet, ()),
        ("vae", convert_vae, "first_stage_model.", cfg.vae, ()),
        clip_job,
    )
    return _load_concat_family(path, jobs, dtype, strict, "sd")
