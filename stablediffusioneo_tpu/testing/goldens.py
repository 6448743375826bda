"""Committed tiny-config end-to-end goldens — pinned drift detectors.

The reference ships its fixture inputs AND torch-fp32 golden outputs
(`compute_score.py:68-69`, `pictures_croped/` + `base_imgs/`, 20 images
each) so any numerical regression is a one-command diff. This module plays
that role weight-free: deterministic seeded tiny-config weights drive one
`process()` (or SDXL scan) per model family / sampler family / image mode,
and the uint8 outputs are committed (`tests/goldens/goldens_v1.npz`). The
fast-tier test replays every record and byte-compares.

Regenerate (after an INTENDED numerical change, on the CPU backend the
tests use):

    python scripts/make_fixtures.py --goldens
    # or: python -m stablediffusioneo_tpu.testing.goldens --out tests/goldens

A mismatch means the compute path changed numerically: either fix the
regression or regenerate on purpose and say why in the commit.

Note: goldens are generated AND replayed on the XLA CPU backend (the test
environment); a jax/XLA upgrade that changes fusion order may legitimately
shift low bits — that is exactly the drift this is meant to surface.
"""

from __future__ import annotations

import os
import sys

import numpy as np

GOLDEN_VERSION = 1
GOLDEN_FILE = f"goldens_v{GOLDEN_VERSION}.npz"

_RES = 64
_STEPS = 2
_SEED = 7


def _perturb_zero_leaves(tree, key):
    """Faithful init zeroes several convs (zero_module semantics: UNet out
    conv, ControlNet taps, proj_out). Goldens need non-degenerate dynamics,
    so perturb every all-zero leaf deterministically."""
    import jax

    leaves, treedef = jax.tree.flatten(tree)
    keys = jax.random.split(key, len(leaves))
    out = [
        leaf + 0.05 * jax.random.normal(k, leaf.shape, leaf.dtype)
        if bool((leaf == 0).all()) else leaf
        for leaf, k in zip(leaves, keys)
    ]
    return jax.tree.unflatten(treedef, out)


def build_sd15_pipe(parameterization: str = "eps"):
    """Deterministic tiny ControlNet pipeline (optionally v-param, the
    SD-2.x sampler path)."""
    import dataclasses

    import jax

    from stablediffusioneo_tpu.config import tiny_pipeline
    from stablediffusioneo_tpu.models import (
        init_clip_text, init_controlnet, init_unet, init_vae,
    )
    from stablediffusioneo_tpu.models.tokenizer import toy_tokenizer
    from stablediffusioneo_tpu.pipeline.canny2image import Canny2ImagePipeline

    cfg = tiny_pipeline()
    if parameterization != "eps":
        cfg = dataclasses.replace(
            cfg, diffusion=dataclasses.replace(
                cfg.diffusion, parameterization=parameterization))
    ks = jax.random.split(jax.random.PRNGKey(20260819), 6)
    params = {
        "unet": _perturb_zero_leaves(init_unet(ks[0], cfg.unet), ks[4]),
        "controlnet": _perturb_zero_leaves(
            init_controlnet(ks[1], cfg.controlnet), ks[5]),
        "vae": init_vae(ks[2], cfg.vae),
        "clip": init_clip_text(ks[3], cfg.clip),
    }
    tok = toy_tokenizer(vocab_size=cfg.clip.vocab_size,
                        max_length=cfg.clip.max_length)
    return Canny2ImagePipeline(params, tok, cfg, persistent_cache=False)


def _sdxl_record():
    """Tiny SDXL txt2img: dual-tower conditioning -> CFG scan -> decode."""
    import jax
    import jax.numpy as jnp

    from stablediffusioneo_tpu.models import init_clip_text, init_unet, init_vae
    from stablediffusioneo_tpu.models.sdxl import (
        sdxl_conditioning, sdxl_txt2img_scan, tiny_sdxl,
    )
    from stablediffusioneo_tpu.models.vae import vae_decode
    from stablediffusioneo_tpu.ops.schedule import DiffusionSchedule

    cfg = tiny_sdxl()
    ks = jax.random.split(jax.random.PRNGKey(20260819), 5)
    params = {
        "unet": _perturb_zero_leaves(init_unet(ks[0], cfg.unet), ks[4]),
        "clip_l": init_clip_text(ks[1], cfg.clip_l),
        "clip_g": init_clip_text(ks[2], cfg.clip_g),
        "vae": init_vae(ks[3], cfg.vae),
    }
    rng = np.random.default_rng(_SEED)
    ids = jnp.asarray(rng.integers(5, 900, (1, 16)).astype(np.int32))
    uncond = jnp.zeros((1, 16), jnp.int32)
    ctx_c, y_c = sdxl_conditioning(params, cfg, ids, ids,
                                   size_hw=(_RES, _RES))
    ctx_u, y_u = sdxl_conditioning(params, cfg, uncond, uncond,
                                   size_hw=(_RES, _RES))
    sched = DiffusionSchedule().ddim(_STEPS)
    x_T = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    z = sdxl_txt2img_scan(params["unet"], cfg, sched, x_T, ctx_c, ctx_u,
                          y_c, y_u, jnp.asarray(5.0),
                          jax.random.PRNGKey(_SEED))
    img = vae_decode(params["vae"], cfg.vae, z, scaled=True)
    img = np.clip(np.asarray(img, np.float32) * 127.5 + 127.5, 0, 255)
    return img.astype(np.uint8)[0]


def _sd15_record_specs():
    """(name, process-kwargs) per sd15 record. ddim/ddim_eta05 share one
    compiled engine (eta rides the schedule arrays); the others each
    compile their own program."""
    from stablediffusioneo_tpu.testing.fixtures import make_scene

    mask = np.zeros((_RES, _RES), np.uint8)
    mask[16:48, 16:48] = 255
    return (
        ("sd15_ddim", {}),
        ("sd15_ddim_eta05", dict(eta=0.5)),
        ("sd15_guess_mode", dict(guess_mode=True)),
        ("sd15_plms", dict(sampler="plms")),
        ("sd15_unipc", dict(sampler="unipc")),
        ("sd15_dpmpp", dict(sampler="dpmpp")),
        ("sd15_euler_a", dict(sampler="euler-a")),
        ("sd15_img2img", dict(init_image=make_scene(1002, _RES),
                              denoise_strength=0.5)),
        ("sd15_inpaint", dict(inpaint_image=make_scene(1003, _RES),
                              inpaint_mask=mask)),
    )


def _build_records(only=None) -> dict:
    """Golden outputs, keyed by record name. Deterministic: seeded
    weights, seeded inputs, fixed seeds through the samplers."""
    from stablediffusioneo_tpu.testing.fixtures import make_scene

    img = make_scene(1001, _RES)
    base = dict(num_samples=1, image_resolution=_RES, ddim_steps=_STEPS,
                seed=_SEED)
    want = (lambda n: only is None or n in only)
    records: dict = {}

    sd15 = [(n, kw) for n, kw in _sd15_record_specs() if want(n)]
    if sd15:
        pipe = build_sd15_pipe()
        for name, kw in sd15:
            records[name] = pipe.process(img, "a bird",
                                         **{**base, **kw})[-1]

    # v-parameterization (the SD-2.x denoise math) on the same topology
    if want("sd21v_ddim"):
        records["sd21v_ddim"] = build_sd15_pipe(
            parameterization="v").process(img, "a bird", **base)[-1]

    if want("sdxl_txt2img"):
        records["sdxl_txt2img"] = _sdxl_record()
    return records


def build_golden_records() -> dict:
    return _build_records()


def build_fast_records() -> dict:
    """The fast-tier subset: one record per model family, minimal engine
    compiles (ddim + ddim_eta05 share a program)."""
    return _build_records(only={"sd15_ddim", "sd15_ddim_eta05",
                                "sd21v_ddim", "sdxl_txt2img"})


def default_path() -> str:
    """tests/goldens/<file> of the repo checkout (generation target)."""
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(repo, "tests", "goldens", GOLDEN_FILE)


def generate(out_dir: str | None = None) -> str:
    # Goldens are an artifact of the EXACT test environment
    # (tests/conftest.py): CPU backend with 8 virtual devices. The device
    # count changes XLA:CPU's intra-op thread partitioning and therefore
    # float reduction order — generating on a 1-device CPU produces arrays
    # that do NOT byte-match the test replay. Force the same config here
    # (works as long as the CPU backend has not been initialized yet).
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    if jax.config.jax_platforms != "cpu":
        jax.config.update("jax_platforms", "cpu")
    n = jax.device_count()
    if n != 8:
        raise RuntimeError(
            f"golden generation needs the test env (8 virtual CPU devices; "
            f"got {n}) — run in a fresh process: "
            "python scripts/make_fixtures.py --goldens")
    out = (os.path.join(out_dir, GOLDEN_FILE) if out_dir
           else default_path())
    os.makedirs(os.path.dirname(out), exist_ok=True)
    records = build_golden_records()
    np.savez_compressed(out, **records)
    total = sum(v.nbytes for v in records.values())
    print(f"wrote {len(records)} goldens ({total/1024:.0f} KiB raw) "
          f"to {out}")
    return out


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    out_dir = None
    if "--out" in argv:
        out_dir = argv[argv.index("--out") + 1]
    generate(out_dir)


if __name__ == "__main__":
    main()
