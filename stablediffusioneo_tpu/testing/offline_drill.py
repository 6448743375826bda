"""Offline real-weight drill: exercise the ENTIRE weight-acquisition path
against full-width files on disk, so the only untested step left in this
zero-egress environment is the download itself.

The reference's value proof runs real downloaded checkpoints
(`/root/reference/canny2image_TRT.py:27` loads control_sd15_canny.pth;
`annotator/hed/__init__.py:88-93` self-fetches annotator weights;
`compute_score.py:8-17` loads pt_inception). This environment cannot fetch
any of them, so the drill synthesizes full-width state dicts FROM THE
PACKAGED KEY UNIVERSES (which were derived from the independent torch
mirrors at real widths, scripts/gen_manifest.py), writes them to REAL
``.pth`` / ``.safetensors`` files, and then runs the production path a
user with real downloads would hit:

    sdeo-readiness --verify-manifest  (structure gate: keys + shapes)
      -> strict load (key accounting)  -> convert  -> one inference

per weight family. Values are random (N(0, 0.02); BN running_var made
positive), which is sufficient: the drill proves file parsing, key
mapping, shape plumbing, and numerical plumbing (finite outputs), not
output quality — quality is gated by the mirror A/B parity tests.

CLI: ``sdeo-readiness --offline-drill [family ...]``; families default to
all of: sd15 sdxl hed openpose mlsd dpt_hybrid uniformer inception.
The two diffusion families are full-width (1.4B / 3.5B params) and take
minutes of XLA-CPU compile each — bound the run with a family list when
iterating.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import numpy as np

ALL_FAMILIES = ("sd15", "sdxl", "hed", "openpose", "mlsd", "dpt_hybrid",
                "uniformer", "inception")

# universe-name -> manifest filename is read from the manifest itself
_FAMILY_ARTIFACTS = {
    "sd15": ("control_sd15_canny",),
    "sdxl": ("sdxl_base",),
    "hed": ("hed",),
    "openpose": ("openpose_body", "openpose_hand"),
    "mlsd": ("mlsd_large",),
    "dpt_hybrid": ("dpt_hybrid",),
    "uniformer": ("uniformer",),
    "inception": ("pt_inception",),
}


def synth_state_dict(universe: Dict[str, str], seed: int = 0,
                     scale: float = 0.02) -> Dict[str, np.ndarray]:
    """Full-width state dict with the universe's exact keys + shapes.

    N(0, scale) f32 except the structurally-constrained leaves:
    ``*running_var`` must be positive (BN rsqrt), ``*num_batches_tracked``
    is an int64 counter, ``*position_ids`` is an int64 arange row.
    """
    rng = np.random.default_rng(seed)
    sd: Dict[str, np.ndarray] = {}
    for k, shape_str in universe.items():
        shape = tuple(int(d) for d in shape_str.split("x")) if shape_str \
            else ()
        if k.endswith("num_batches_tracked"):
            sd[k] = np.zeros(shape, np.int64)
        elif k.endswith("position_ids"):
            sd[k] = np.arange(int(np.prod(shape) or 1),
                              dtype=np.int64).reshape(shape or (1,))
        elif k.endswith("running_var"):
            sd[k] = np.abs(rng.standard_normal(shape).astype(np.float32)
                           ) * scale + 1.0
        else:
            sd[k] = rng.standard_normal(shape).astype(np.float32) * scale
    return sd


def write_pth(sd: Dict[str, np.ndarray], path: str) -> str:
    import torch

    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)
    return path


def write_safetensors(sd: Dict[str, np.ndarray], path: str) -> str:
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, path)
    return path


def _synth_artifact(name: str, out_dir: str, fmt: Optional[str] = None,
                    seed: int = 0) -> str:
    """Synthesize one manifest artifact to disk under its REAL filename
    (verify_file matches on the basename)."""
    from stablediffusioneo_tpu.checkpoint.manifest import (
        load_manifest, load_universe)

    entry = load_manifest()["artifacts"][name]
    uni = load_universe(entry["universe"])
    sd = synth_state_dict(uni, seed=seed)
    path = os.path.join(out_dir, entry["filename"])
    if (fmt or os.path.splitext(entry["filename"])[1]) in (
            ".safetensors", "safetensors"):
        return write_safetensors(sd, path)
    return write_pth(sd, path)


def _verify(path: str, name: str) -> Dict:
    from stablediffusioneo_tpu.checkpoint.manifest import verify_file

    return verify_file(path, name=name)


def _finite_u8(img: np.ndarray, what: str):
    assert img.dtype == np.uint8, f"{what}: dtype {img.dtype}"
    assert img.size and np.isfinite(img.astype(np.float32)).all(), what


def drill_sd15(out_dir: str, res: int, steps: int, log) -> Dict:
    """control_sd15_canny.pth: verify -> strict load (both readers) ->
    full-width canny2image process() -> uint8 image."""
    import jax.numpy as jnp  # noqa: F401 — ensures jax is importable first

    from stablediffusioneo_tpu.checkpoint.convert import (
        load_controlnet_pipeline)
    from stablediffusioneo_tpu.checkpoint.manifest import (
        load_manifest, load_universe)
    from stablediffusioneo_tpu.checkpoint.torch_reader import (
        load_torch_state_dict)
    from stablediffusioneo_tpu.config import sd15_pipeline
    from stablediffusioneo_tpu.models.tokenizer import toy_tokenizer
    from stablediffusioneo_tpu.pipeline.canny2image import (
        Canny2ImagePipeline)

    entry = load_manifest()["artifacts"]["control_sd15_canny"]
    uni = load_universe(entry["universe"])
    sd = synth_state_dict(uni, seed=1)
    # a real checkpoint also carries the DDPM schedule buffers the
    # converters deliberately ignore (SD_KNOWN_UNUSED) — include a few so
    # the drill exercises the known-unused path, not just the happy set
    sd["betas"] = np.linspace(8.5e-4, 1.2e-2, 1000).astype(np.float32)
    sd["alphas_cumprod"] = np.cumprod(1.0 - sd["betas"]).astype(np.float32)
    sd["logvar"] = np.zeros(1000, np.float32)
    path = write_pth(sd, os.path.join(out_dir, entry["filename"]))
    log(f"[sd15] wrote {path} ({os.path.getsize(path)/1e9:.2f} GB)")
    rep = _verify(path, "control_sd15_canny")
    log(f"[sd15] manifest verify OK: {rep['key_count']} keys")

    # torch-free reader must agree with the torch reader on the same file
    raw_t = load_torch_state_dict(path, prefer_torch=True)
    raw_f = load_torch_state_dict(path, prefer_torch=False)
    assert set(raw_t) == set(raw_f)
    probe = sorted(raw_t)[::max(1, len(raw_t) // 16)]
    for k in probe:
        np.testing.assert_array_equal(np.asarray(raw_t[k]),
                                      np.asarray(raw_f[k]))
    del raw_t, raw_f

    cfg = sd15_pipeline(dtype="float32")
    t0 = time.perf_counter()
    params = load_controlnet_pipeline(path, cfg=cfg)  # strict accounting
    log(f"[sd15] strict load+convert: {time.perf_counter()-t0:.0f}s")
    tok = toy_tokenizer(vocab_size=cfg.clip.vocab_size,
                        max_length=cfg.clip.max_length)
    pipe = Canny2ImagePipeline(params, tok, cfg, persistent_cache=False)
    src = np.zeros((res, res, 3), np.uint8)
    src[res // 4: -res // 4, res // 4: -res // 4] = 220
    t0 = time.perf_counter()
    out = pipe.process(src, "a bird", num_samples=1, image_resolution=res,
                       ddim_steps=steps, seed=7)[-1]
    log(f"[sd15] full-width process() ({res}px/{steps} step): "
        f"{time.perf_counter()-t0:.0f}s")
    _finite_u8(np.asarray(out), "sd15 sample")
    return {"family": "sd15", "keys": len(sd), "image": np.asarray(out).shape}


def drill_sdxl(out_dir: str, res: int, steps: int, log) -> Dict:
    """sd_xl_base_1.0.safetensors: verify -> strict load -> one txt2img
    sample+decode at full width."""
    import jax
    import jax.numpy as jnp

    from stablediffusioneo_tpu.checkpoint.convert import load_sdxl_pipeline
    from stablediffusioneo_tpu.models.sdxl import (
        SDXLConfig, sdxl_conditioning, sdxl_txt2img_scan)
    from stablediffusioneo_tpu.models.vae import vae_decode
    from stablediffusioneo_tpu.ops.schedule import DiffusionSchedule

    path = _synth_artifact("sdxl_base", out_dir, seed=2)
    log(f"[sdxl] wrote {path} ({os.path.getsize(path)/1e9:.2f} GB)")
    rep = _verify(path, "sdxl_base")
    log(f"[sdxl] manifest verify OK: {rep['key_count']} keys")
    cfg = SDXLConfig(dtype="float32")
    t0 = time.perf_counter()
    params = load_sdxl_pipeline(path, cfg)  # strict accounting
    log(f"[sdxl] strict load+convert: {time.perf_counter()-t0:.0f}s")
    ids = np.zeros((1, cfg.clip_l.max_length), np.int32)
    ids[0, 1] = 42
    ctx, y = sdxl_conditioning(params, cfg, jnp.asarray(ids),
                               jnp.asarray(ids), size_hw=(res, res))
    sched = DiffusionSchedule().ddim(steps)
    h = res // 8
    x_T = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, h, h, 4)).astype(np.float32))
    t0 = time.perf_counter()
    z = sdxl_txt2img_scan(params["unet"], cfg, sched, x_T, ctx, ctx, y, y,
                          jnp.float32(5.0), jax.random.PRNGKey(3))
    img = vae_decode(params["vae"], cfg.vae, z, scaled=True)
    img = np.asarray(jnp.clip(img.astype(jnp.float32) * 127.5 + 127.5,
                              0, 255).astype(jnp.uint8))
    log(f"[sdxl] full-width sample+decode ({res}px/{steps} step): "
        f"{time.perf_counter()-t0:.0f}s")
    _finite_u8(img, "sdxl sample")
    return {"family": "sdxl", "keys": rep["key_count"], "image": img.shape}


def _frame(res: int = 256) -> np.ndarray:
    rng = np.random.default_rng(11)
    img = (rng.random((res, res, 3)) * 255).astype(np.uint8)
    img[res // 4: -res // 4, res // 4: -res // 4] = 230
    return img


def drill_hed(out_dir: str, log) -> Dict:
    from stablediffusioneo_tpu.annotators.hed import HEDdetector

    path = _synth_artifact("hed", out_dir, seed=3)
    _verify(path, "hed")
    det = HEDdetector(ckpt_path=path)
    out = det(_frame())
    _finite_u8(out, "hed map")
    return {"family": "hed", "map": out.shape}


def drill_openpose(out_dir: str, log) -> Dict:
    from stablediffusioneo_tpu.annotators.openpose import OpenposeDetector

    body = _synth_artifact("openpose_body", out_dir, seed=4)
    hand = _synth_artifact("openpose_hand", out_dir, seed=5)
    _verify(body, "openpose_body")
    _verify(hand, "openpose_hand")
    det = OpenposeDetector(body_ckpt=body, hand_ckpt=hand)
    out, _ = det(_frame(), hand=True)
    _finite_u8(out, "openpose canvas")
    return {"family": "openpose", "map": out.shape}


def drill_mlsd(out_dir: str, log) -> Dict:
    from stablediffusioneo_tpu.annotators.mlsd import MLSDdetector

    path = _synth_artifact("mlsd_large", out_dir, seed=6)
    _verify(path, "mlsd_large")
    det = MLSDdetector(ckpt_path=path)
    out = det(_frame(), thr_v=0.1, thr_d=0.1)
    _finite_u8(out, "mlsd map")
    return {"family": "mlsd", "map": out.shape}


def drill_dpt_hybrid(out_dir: str, log) -> Dict:
    from stablediffusioneo_tpu.annotators.midas import MidasDetector

    path = _synth_artifact("dpt_hybrid", out_dir, seed=7)
    _verify(path, "dpt_hybrid")
    det = MidasDetector(ckpt_path=path, model_type="dpt_hybrid")
    depth, normal = det(_frame())
    _finite_u8(depth, "dpt depth")
    _finite_u8(normal, "dpt normal")
    return {"family": "dpt_hybrid", "map": depth.shape}


def drill_uniformer(out_dir: str, log) -> Dict:
    from stablediffusioneo_tpu.annotators.uniformer import (
        UniformerDetector, convert_uniformer_upernet)
    from stablediffusioneo_tpu.checkpoint.torch_reader import (
        load_torch_state_dict)

    path = _synth_artifact("uniformer", out_dir, seed=8)
    _verify(path, "uniformer")
    det = UniformerDetector(
        params=convert_uniformer_upernet(load_torch_state_dict(path)))
    out = det(_frame())
    _finite_u8(out, "uniformer seg")
    return {"family": "uniformer", "map": out.shape}


def drill_inception(out_dir: str, log) -> Dict:
    from stablediffusioneo_tpu.scoring.inception import (
        InceptionFeatureExtractor)

    path = _synth_artifact("pt_inception", out_dir, seed=9)
    _verify(path, "pt_inception")
    ex = InceptionFeatureExtractor(ckpt_path=path)
    feats = ex(_frame())
    assert feats.shape[-1] == 2048 and np.isfinite(feats).all()
    return {"family": "inception", "features": feats.shape}


_RUNNERS = {
    "hed": drill_hed,
    "openpose": drill_openpose,
    "mlsd": drill_mlsd,
    "dpt_hybrid": drill_dpt_hybrid,
    "uniformer": drill_uniformer,
    "inception": drill_inception,
}


def run_drill(families=ALL_FAMILIES, out_dir: Optional[str] = None,
              res: int = 256, steps: int = 1, keep_files: bool = False,
              log=print) -> List[Dict]:
    """Run the drill for the given families; returns per-family reports.
    Files are written under out_dir (a fresh temp dir by default) and
    deleted after each family unless keep_files (sd15+sdxl alone are
    ~20 GB)."""
    import shutil
    import tempfile

    own_dir = out_dir is None
    out_dir = out_dir or tempfile.mkdtemp(prefix="sdeo_drill_")
    reports = []
    try:
        for fam in families:
            if fam not in ALL_FAMILIES:
                raise ValueError(f"unknown drill family {fam!r}; have "
                                 f"{ALL_FAMILIES}")
            t0 = time.perf_counter()
            log(f"[drill] {fam}: start")
            if fam == "sd15":
                rep = drill_sd15(out_dir, res, steps, log)
            elif fam == "sdxl":
                rep = drill_sdxl(out_dir, res, steps, log)
            else:
                rep = _RUNNERS[fam](out_dir, log)
            rep["seconds"] = round(time.perf_counter() - t0, 1)
            log(f"[drill] {fam}: OK {rep}")
            reports.append(rep)
            if not keep_files:
                for f in os.listdir(out_dir):
                    os.unlink(os.path.join(out_dir, f))
    finally:
        if own_dir and not keep_files:
            shutil.rmtree(out_dir, ignore_errors=True)
    return reports
