"""Generate the packaged weights manifest + required key universes.

Derives the REQUIRED key universe (key + shape) for every external
checkpoint from the independent torch mirrors at real widths (meta device —
no weight allocation), then writes:

  stablediffusioneo_tpu/checkpoint/weights_manifest.json
  stablediffusioneo_tpu/checkpoint/universes/<name>.txt.gz

Dev tool: requires torch + transformers (the `mirrors` extra) and the
repo checkout (test modules provide the annotator mirrors).

Run from the repo root:  python scripts/gen_manifest.py
"""

import gzip
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
try:
    import stablediffusioneo_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import torch

from stablediffusioneo_tpu.checkpoint.accounting import SD_KNOWN_UNUSED
from stablediffusioneo_tpu.checkpoint.manifest import key_universe_digest

OUT_DIR = os.path.join(REPO, "stablediffusioneo_tpu", "checkpoint")
UNI_DIR = os.path.join(OUT_DIR, "universes")


def meta_state_dict(build, *a, **kw):
    """State-dict keys+shapes without allocating weights."""
    try:
        with torch.device("meta"):
            mod = build(*a, **kw)
    except Exception:  # meta-incompatible module: build small but real
        mod = build(*a, **kw)
    return {k: tuple(v.shape) for k, v in mod.state_dict().items()}


def write_universe(name, keys_shapes):
    os.makedirs(UNI_DIR, exist_ok=True)
    path = os.path.join(UNI_DIR, f"{name}.txt.gz")
    lines = [f"{k}\t" + "x".join(str(d) for d in shape)
             for k, shape in sorted(keys_shapes.items())]
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    print(f"  {name}: {len(keys_shapes)} keys -> {path}")
    return {
        "universe": name,
        "key_count": len(keys_shapes),
        "key_universe_sha256": key_universe_digest(keys_shapes),
    }


def sdxl_base_universe():
    """SDXL-base sgm-layout universe from the same mirrors
    load_sdxl_pipeline's converters are parity-tested against."""
    from transformers import CLIPTextConfig as HFConfig, CLIPTextModel

    from stablediffusioneo_tpu.models.sdxl import SDXLConfig
    from test_key_accounting import _openclip_text_mirror
    from torch_ref import TorchUNet, TorchVAE

    cfg = SDXLConfig()
    uni = {}
    for k, s in meta_state_dict(TorchUNet, cfg.unet).items():
        uni["model.diffusion_model." + k] = s
    hf_cfg = HFConfig(
        vocab_size=cfg.clip_l.vocab_size, hidden_size=cfg.clip_l.hidden_size,
        intermediate_size=cfg.clip_l.intermediate_size,
        num_hidden_layers=cfg.clip_l.num_layers,
        num_attention_heads=cfg.clip_l.num_heads,
        max_position_embeddings=cfg.clip_l.max_length,
        hidden_act="gelu")
    for k, s in meta_state_dict(CLIPTextModel, hf_cfg).items():
        uni["conditioner.embedders.0.transformer." + k] = s
    for k, s in meta_state_dict(_openclip_text_mirror, cfg.clip_g).items():
        uni["conditioner.embedders.1.model." + k] = s
    for k, s in meta_state_dict(TorchVAE, cfg.vae).items():
        uni["first_stage_model." + k] = s
    return uni


def sd15_canny_universe():
    from transformers import CLIPTextConfig as HFConfig, CLIPTextModel

    from stablediffusioneo_tpu.config import sd15_pipeline
    from torch_ref import TorchControlNet, TorchUNet, TorchVAE

    cfg = sd15_pipeline()
    uni = {}
    for pre, build, arg in (
        ("model.diffusion_model.", TorchUNet, cfg.unet),
        ("control_model.", TorchControlNet, cfg.controlnet),
        ("first_stage_model.", TorchVAE, cfg.vae),
    ):
        for k, s in meta_state_dict(build, arg).items():
            uni[pre + k] = s
    hf_cfg = HFConfig(
        vocab_size=cfg.clip.vocab_size, hidden_size=cfg.clip.hidden_size,
        intermediate_size=cfg.clip.intermediate_size,
        num_hidden_layers=cfg.clip.num_layers,
        num_attention_heads=cfg.clip.num_heads,
        max_position_embeddings=cfg.clip.max_length,
        hidden_act="quick_gelu")
    for k, s in meta_state_dict(CLIPTextModel, hf_cfg).items():
        uni["cond_stage_model.transformer." + k] = s
    return uni


def main():
    artifacts = {}

    def torch_entry(name, filename, source, role, uni, allowed_extra=()):
        artifacts[name] = {
            "filename": filename,
            "role": role,
            "source": source,
            "format": "torch_sd",
            "sha256": None,       # pin on first trusted download
            "size_bytes": None,   # (sdeo-readiness --pin-manifest)
            "allowed_extra": list(allowed_extra),
            **(write_universe(name, uni) if uni else {"universe": None}),
        }

    hf_cn = "https://huggingface.co/lllyasviel/ControlNet/resolve/main"
    hf_ann = f"{hf_cn}/annotator/ckpts"

    torch_entry(
        "control_sd15_canny", "control_sd15_canny.pth",
        f"{hf_cn}/models/control_sd15_canny.pth",
        "SD-1.5 + canny ControlNet pipeline (UNet/ControlNet/VAE/CLIP)",
        sd15_canny_universe(), allowed_extra=SD_KNOWN_UNUSED)

    torch_entry(
        "sdxl_base", "sd_xl_base_1.0.safetensors",
        "https://huggingface.co/stabilityai/stable-diffusion-xl-base-1.0/"
        "resolve/main/sd_xl_base_1.0.safetensors",
        "SDXL-base txt2img pipeline (UNet/CLIP-L/OpenCLIP-bigG/VAE)",
        sdxl_base_universe(),
        allowed_extra=list(SD_KNOWN_UNUSED) + [
            r"conditioner\.embedders\.0\.transformer\..*position_ids",
            r"conditioner\.embedders\.1\.model\..*attn_mask",
            r"conditioner\.embedders\.1\.model\..*logit_scale",
        ])

    # HED universe comes from the PRODUCTION widths (annotators.hed._BLOCKS,
    # the upstream ControlNetHED_Apache2 64/128/256/512 ladder), not the
    # tiny test mirror _TorchHED — the r4 manifest shipped the tiny-mirror
    # shapes and would have rejected the real ControlNetHED.pth download.
    from stablediffusioneo_tpu.annotators.hed import _BLOCKS as HED_BLOCKS

    def hed_universe():
        ks = {"norm": (1, 3, 1, 1)}
        for bi, (cin, cout, n) in enumerate(HED_BLOCKS):
            base = f"block{bi + 1}"
            c = cin
            for i in range(n):
                ks[f"{base}.convs.{i}.weight"] = (cout, c, 3, 3)
                ks[f"{base}.convs.{i}.bias"] = (cout,)
                c = cout
            ks[f"{base}.projection.weight"] = (1, cout, 1, 1)
            ks[f"{base}.projection.bias"] = (1,)
        return ks

    torch_entry(
        "hed", "ControlNetHED.pth",
        "https://huggingface.co/lllyasviel/Annotators/resolve/main/"
        "ControlNetHED.pth",
        "HED soft-edge annotator", hed_universe())

    from test_pose_depth_mlsd import (
        _torch_body, _torch_hand, _torch_mlsd_large,
    )

    torch_entry("openpose_body", "body_pose_model.pth",
                f"{hf_ann}/body_pose_model.pth",
                "OpenPose body estimator", meta_state_dict(_torch_body))
    torch_entry("openpose_hand", "hand_pose_model.pth",
                f"{hf_ann}/hand_pose_model.pth",
                "OpenPose hand estimator", meta_state_dict(_torch_hand))
    torch_entry("mlsd_large", "mlsd_large_512_fp32.pth",
                f"{hf_ann}/mlsd_large_512_fp32.pth",
                "MLSD line detector (large)",
                meta_state_dict(_torch_mlsd_large))

    import test_dpt_hybrid_mirror as dpt_h

    torch_entry("dpt_hybrid", "dpt_hybrid-midas-501f0c75.pt",
                f"{hf_ann}/dpt_hybrid-midas-501f0c75.pt",
                "MiDaS DPT-hybrid depth estimator",
                meta_state_dict(dpt_h.Mirror))
    # dpt_large has no real-width mirror in-tree (the JAX net + converter
    # are full-architecture; the A/B mirror runs a reduced ViT): pin-only.
    torch_entry("dpt_large", "dpt_large-midas-2f21e586.pt",
                "https://github.com/intel-isl/DPT/releases/download/1_0/"
                "dpt_large-midas-2f21e586.pt",
                "MiDaS DPT-large depth estimator", None)

    import test_uniformer_mirror as uf_m

    torch_entry("uniformer", "upernet_global_small.pth",
                f"{hf_ann}/upernet_global_small.pth",
                "UniFormer+UperNet segmentation annotator",
                meta_state_dict(uf_m.Segmentor),
                # mmseg checkpoints wrap weights with meta/optimizer keys
                allowed_extra=(r"meta", r"optimizer", r".*num_batches_tracked"))

    from test_yolo_scoring import TestInceptionV3

    inc = {k: tuple(v.shape)
           for k, v in TestInceptionV3()._random_sd().items()}
    torch_entry("pt_inception", "pt_inception-2015-12-05-6726825d.pth",
                "https://github.com/mseitzer/pytorch-fid/releases/download/"
                "fid_weights/pt_inception-2015-12-05-6726825d.pth",
                "FID InceptionV3 (perceptual-distance scoring)", inc,
                allowed_extra=(r"fc\..*",))

    artifacts["clip_vocab"] = {
        "filename": "vocab.json",
        "role": "CLIP BPE vocabulary (openai/clip-vit-large-patch14)",
        "source": "https://huggingface.co/openai/clip-vit-large-patch14/"
                  "resolve/main/vocab.json",
        "format": "json_vocab", "expected_entries": 49408,
        "sha256": None, "size_bytes": None,
    }
    artifacts["clip_merges"] = {
        "filename": "merges.txt",
        "role": "CLIP BPE merge ranks (openai/clip-vit-large-patch14)",
        "source": "https://huggingface.co/openai/clip-vit-large-patch14/"
                  "resolve/main/merges.txt",
        "format": "text_merges", "min_lines": 48000,
        "sha256": None, "size_bytes": None,
    }

    manifest = {
        "version": 1,
        "note": "sha256/size_bytes are null until pinned on first trusted "
                "download (sdeo-readiness --pin-manifest FILE...); "
                "structure checks (required key universe + shapes) work "
                "offline from day one.",
        "artifacts": artifacts,
    }
    out = os.path.join(OUT_DIR, "weights_manifest.json")
    with open(out, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(artifacts)} artifacts -> {out}")


if __name__ == "__main__":
    main()
