"""Real-checkpoint readiness: one command from weights to a parity verdict.

The day `control_sd15_canny.pth` (+ CLIP vocab/merges) is available, this
runs the full-scale parity check that the zero-egress dev environment
cannot: JAX pipeline vs an independent torch executor on the SAME weights,
scored with the hackathon perceptual-distance formula (the
`compute_score_torch` analog — reference compute_score.py:40-73).

    sdeo-readiness --ckpt control_sd15_canny.pth \
        --vocab vocab.json --merges merges.txt [--res 512 --steps 20 --n 3]

Stages:
  1. load + convert the checkpoint into the four JAX trees;
  2. load the SAME state dict into the torch mirrors
     (stablediffusioneo_tpu/testing/torch_ref.py, identical key naming)
     and generate golden images (torch CPU fp32 —
     slow at 512x512; cache with --golden-dir / reuse later);
  3. run the JAX pipeline on the fixture images;
  4. report per-image PD + hackathon score; exit nonzero if mean PD exceeds
     --pd-limit (default 10, the score formula's zero-penalty knee).

`--dry-run` exercises the identical flow end-to-end on random tiny-config
weights (no files needed) — CI-able proof the harness itself works.
"""

import argparse
import os
import sys
import time

import numpy as np


def torch_golden(sd, cfg, tok, images, prompt, steps, res, seed, scale=9.0):
    """Independent torch executor on the same weights: the canny2image_torch
    flow (annotator -> CLIP -> DDIM CFG loop -> VAE decode)."""
    import torch

    from stablediffusioneo_tpu.testing.torch_ref import (
        TorchControlNet, TorchUNet, TorchVAE,
    )
    from stablediffusioneo_tpu.annotators.canny import CannyDetector
    from stablediffusioneo_tpu.annotators.util import HWC3, resize_image
    from stablediffusioneo_tpu.ops.schedule import DiffusionSchedule
    import jax

    def sub(prefix):
        return {k[len(prefix):]: torch.from_numpy(np.asarray(v))
                for k, v in sd.items() if k.startswith(prefix)}

    unet_t = TorchUNet(cfg.unet).eval()
    unet_t.load_state_dict(sub("model.diffusion_model."))
    ctrl_t = TorchControlNet(cfg.controlnet).eval()
    ctrl_t.load_state_dict(sub("control_model."))
    vae_t = TorchVAE(cfg.vae).eval()
    vae_t.load_state_dict(sub("first_stage_model."))

    from transformers import CLIPTextConfig as HFConfig, CLIPTextModel

    hf = CLIPTextModel(HFConfig(
        vocab_size=cfg.clip.vocab_size, hidden_size=cfg.clip.hidden_size,
        intermediate_size=cfg.clip.intermediate_size,
        num_hidden_layers=cfg.clip.num_layers,
        num_attention_heads=cfg.clip.num_heads,
        max_position_embeddings=cfg.clip.max_length,
        hidden_act="quick_gelu",
    )).eval()
    hf.load_state_dict(sub("cond_stage_model.transformer."))

    sched = DiffusionSchedule(
        cfg.diffusion.timesteps, cfg.diffusion.linear_start,
        cfg.diffusion.linear_end, cfg.diffusion.schedule).ddim(steps)

    goldens = []
    a_prompt = "best quality, extremely detailed"
    n_prompt = ("longbody, lowres, bad anatomy, bad hands, missing fingers, "
                "extra digit, fewer digits, cropped, worst quality, low quality")
    for img in images:
        rimg = resize_image(HWC3(img), res)
        detected = HWC3(CannyDetector()(rimg, 100, 200))
        hint = torch.from_numpy(
            (detected.astype(np.float32) / 255.0)[None]).permute(0, 3, 1, 2)
        ids = tok([prompt + ", " + a_prompt, n_prompt]).astype(np.int64)
        with torch.no_grad():
            ctx = hf(input_ids=torch.from_numpy(ids)).last_hidden_state
        ctx_c, ctx_u = ctx[0:1], ctx[1:2]
        H, W = rimg.shape[:2]
        key = jax.random.PRNGKey(seed)
        _, sub_key = jax.random.split(key)
        x = torch.from_numpy(np.transpose(np.asarray(
            jax.random.normal(sub_key, (1, H // 8, W // 8, 4), "float32")),
            (0, 3, 1, 2)))
        with torch.no_grad():
            for i in range(steps):
                t = torch.full((1,), float(sched["timesteps"][i]))
                e_c = unet_t(x, t, ctx_c, control=list(ctrl_t(x, hint, t, ctx_c)))
                e_u = unet_t(x, t, ctx_u, control=list(ctrl_t(x, hint, t, ctx_u)))
                e = e_u + scale * (e_c - e_u)
                a_t = float(sched["alphas"][i])
                a_prev = float(sched["alphas_prev"][i])
                sq = float(sched["sqrt_one_minus_alphas"][i])
                x0 = (x - sq * e) / np.sqrt(a_t)
                x = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * e
            out = vae_t.decode(x / cfg.vae.scale_factor)
        out = out.permute(0, 2, 3, 1).numpy()[0]
        goldens.append(np.clip(out * 127.5 + 127.5, 0, 255).astype(np.uint8))
    return goldens


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt")
    ap.add_argument("--vocab")
    ap.add_argument("--merges")
    ap.add_argument("--golden-dir", help="reuse cached torch goldens")
    ap.add_argument("--save-goldens", help="write torch goldens here")
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--seed", type=int, default=2946901)
    ap.add_argument("--pd-limit", type=float, default=10.0)
    ap.add_argument("--dry-run", action="store_true",
                    help="random tiny-config weights, no files needed")
    ap.add_argument("--verify-manifest", nargs="*", metavar="FILE",
                    help="verify downloaded weight files against the "
                         "packaged manifest (integrity + required key "
                         "universe) and exit; with no FILEs, verifies "
                         "--ckpt/--vocab/--merges before the drill")
    ap.add_argument("--pin-manifest", nargs="+", metavar="FILE",
                    help="first trusted contact: structure-check FILEs, "
                         "then record sha256+size into the manifest")
    ap.add_argument("--manifest", default=None,
                    help="manifest json path (default: the packaged one)")
    ap.add_argument("--offline-drill", nargs="*", metavar="FAMILY",
                    help="zero-egress real-weight drill: synthesize "
                         "FULL-WIDTH state dicts from the packaged key "
                         "universes, write real .pth/.safetensors files, "
                         "then run manifest verify -> strict load -> "
                         "convert -> one inference per family. No FAMILYs "
                         "= all (sd15 sdxl hed openpose mlsd dpt_hybrid "
                         "uniformer inception); the diffusion families "
                         "take minutes of XLA-CPU compile each")
    ap.add_argument("--drill-res", type=int, default=256,
                    help="sample resolution for the drill's sd15/sdxl legs")
    ap.add_argument("--drill-steps", type=int, default=1,
                    help="sampler steps for the drill's sd15/sdxl legs")
    args = ap.parse_args()

    if args.offline_drill is not None:
        from stablediffusioneo_tpu.testing.offline_drill import (
            ALL_FAMILIES, run_drill)

        fams = tuple(args.offline_drill) or ALL_FAMILIES
        reports = run_drill(fams, res=args.drill_res,
                            steps=args.drill_steps)
        print(f"OFFLINE DRILL: PASS ({len(reports)} families: "
              f"{[r['family'] for r in reports]})")
        sys.exit(0)

    if args.pin_manifest or args.verify_manifest is not None:
        from stablediffusioneo_tpu.checkpoint.manifest import (
            ManifestError, pin_file, verify_file,
        )

        files = (args.pin_manifest or args.verify_manifest
                 or [f for f in (args.ckpt, args.vocab, args.merges) if f])
        if not files:
            ap.error("--verify-manifest needs FILEs (or --ckpt/--vocab/"
                     "--merges)")
        failed = False
        for f in files:
            try:
                if args.pin_manifest:
                    e = pin_file(f, manifest_path=args.manifest)
                    print(f"PINNED {f}: sha256={e['sha256'][:16]}… "
                          f"({e['size_bytes']} B)")
                else:
                    rep = verify_file(f, manifest_path=args.manifest)
                    print(f"OK {f}: {rep}")
            except ManifestError as e:
                print(f"REJECTED {f}:\n{e}")
                failed = True
        if args.pin_manifest or failed or not (args.ckpt and args.vocab
                                               and args.merges):
            sys.exit(1 if failed else 0)
        print("[manifest] all files verified; continuing to the parity "
              "drill")

    import cv2
    import jax

    from stablediffusioneo_tpu.testing.fixtures import make_scene
    from stablediffusioneo_tpu.pipeline.canny2image import Canny2ImagePipeline
    from stablediffusioneo_tpu.scoring.score import get_score, perceptual_distance

    if args.dry_run:
        import torch

        from stablediffusioneo_tpu.testing.torch_ref import (
            TorchControlNet, TorchUNet, TorchVAE,
        )
        from transformers import CLIPTextConfig as HFConfig, CLIPTextModel
        from stablediffusioneo_tpu.config import tiny_pipeline
        from stablediffusioneo_tpu.models.tokenizer import toy_tokenizer

        cfg = tiny_pipeline()
        args.res, args.steps, args.n = 64, 2, 2
        torch.manual_seed(0)
        sd = {}
        for mod, pre in ((TorchUNet(cfg.unet).eval(), "model.diffusion_model."),
                         (TorchControlNet(cfg.controlnet).eval(), "control_model."),
                         (TorchVAE(cfg.vae).eval(), "first_stage_model.")):
            for k, v in mod.state_dict().items():
                sd[pre + k] = v.numpy()
        hf = CLIPTextModel(HFConfig(
            vocab_size=cfg.clip.vocab_size, hidden_size=cfg.clip.hidden_size,
            intermediate_size=cfg.clip.intermediate_size,
            num_hidden_layers=cfg.clip.num_layers,
            num_attention_heads=cfg.clip.num_heads,
            max_position_embeddings=cfg.clip.max_length,
            hidden_act="quick_gelu")).eval()
        for k, v in hf.state_dict().items():
            sd["cond_stage_model.transformer." + k] = v.numpy()
        tok = toy_tokenizer(vocab_size=cfg.clip.vocab_size,
                            max_length=cfg.clip.max_length)
    else:
        if not (args.ckpt and args.vocab and args.merges):
            ap.error("--ckpt/--vocab/--merges required (or --dry-run)")
        from stablediffusioneo_tpu.checkpoint.torch_reader import (
            load_torch_state_dict,
        )
        from stablediffusioneo_tpu.config import sd15_pipeline
        from stablediffusioneo_tpu.models.tokenizer import CLIPTokenizer

        cfg = sd15_pipeline(dtype="bfloat16")
        sd = load_torch_state_dict(args.ckpt)
        tok = CLIPTokenizer.from_hf_files(args.vocab, args.merges,
                                          max_length=cfg.clip.max_length)

    # JAX pipeline from the same state dict, behind the strict accounting
    # gate: a real checkpoint either maps 100% (modulo the documented
    # SD_KNOWN_UNUSED buffers) or this exits naming the orphan keys.
    import jax as _jax

    from stablediffusioneo_tpu.checkpoint.accounting import account_pipeline
    from stablediffusioneo_tpu.models import (
        init_clip_text, init_controlnet, init_unet, init_vae,
    )

    key = _jax.random.PRNGKey(0)
    rep = account_pipeline(sd, cfg, expect={
        "unet": _jax.eval_shape(lambda k: init_unet(k, cfg.unet), key),
        "controlnet": _jax.eval_shape(
            lambda k: init_controlnet(k, cfg.controlnet), key),
        "vae": _jax.eval_shape(lambda k: init_vae(k, cfg.vae), key),
        "clip": _jax.eval_shape(lambda k: init_clip_text(k, cfg.clip), key),
    }).assert_complete("controlnet_pipeline")
    print(f"[accounting] {len(rep.consumed)} keys consumed, "
          f"{len(rep.ignored)} known-unused"
          + (f" ({sorted(rep.ignored)[:4]}...)" if rep.ignored else ""))
    params = rep.tree
    pipe = Canny2ImagePipeline(params, tok, cfg)

    images = [make_scene(1000 + i, args.res) for i in range(args.n)]
    prompt = "a bird"

    if args.golden_dir:
        goldens = [cv2.imread(os.path.join(
            args.golden_dir, f"golden_{i}.png"))[:, :, ::-1]
            for i in range(args.n)]
    else:
        print(f"[torch] generating {args.n} goldens at {args.res}px/"
              f"{args.steps} steps (fp32 CPU — slow at full scale)...",
              flush=True)
        goldens = torch_golden(sd, cfg, tok, images, prompt,
                               args.steps, args.res, args.seed)
        if args.save_goldens:
            os.makedirs(args.save_goldens, exist_ok=True)
            for i, g in enumerate(goldens):
                cv2.imwrite(os.path.join(args.save_goldens,
                                         f"golden_{i}.png"), g[:, :, ::-1])

    pds, times = [], []
    for i, (img, gold) in enumerate(zip(images, goldens)):
        t0 = time.perf_counter()
        out = pipe.process(img, prompt, num_samples=1,
                           image_resolution=args.res, ddim_steps=args.steps,
                           seed=args.seed)[-1]
        dt = (time.perf_counter() - t0) * 1e3
        pd = perceptual_distance(out, gold)
        pds.append(pd)
        times.append(dt)
        print(f"image {i}: t={dt:.0f} ms  PD={pd:.3f}  "
              f"score={get_score(dt, pd):.1f}")

    mean_pd = float(np.mean(pds))
    print(f"\nmean PD = {mean_pd:.3f} (limit {args.pd_limit}), "
          f"median t = {np.median(times):.0f} ms")
    if mean_pd > args.pd_limit:
        print("READINESS: FAIL — JAX output diverges from the torch golden")
        sys.exit(1)
    print("READINESS: PASS")


if __name__ == "__main__":
    main()
