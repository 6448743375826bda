"""Serve canny2image over HTTP with cross-request TPU batching.

The deployment entry point: loads a checkpoint (or a random-weight tiny
config with --tiny), wraps the pipeline in a DiffusionServer, and exposes
it via the stdlib HTTP API (stablediffusioneo_tpu/serving/http_api.py).
Concurrent clients batch onto the TPU automatically.

  sdeo-serve --ckpt control_sd15_canny.pth \
      --vocab vocab.json --merges merges.txt --port 8000
  sdeo-serve --tiny --port 8000                       # smoke/demo mode

  curl -s localhost:8000/healthz
  curl -s localhost:8000/stats
  curl -s -X POST localhost:8000/generate -d \
      '{"image_b64": "<base64 png>", "prompt": "a bird", "seed": 1}'
"""

import argparse


def build_pipeline(args):
    import jax

    from stablediffusioneo_tpu.pipeline.canny2image import Canny2ImagePipeline

    if args.tiny:
        from stablediffusioneo_tpu.config import tiny_pipeline
        from stablediffusioneo_tpu.models import (
            init_clip_text, init_controlnet, init_unet, init_vae,
        )
        from stablediffusioneo_tpu.models.tokenizer import toy_tokenizer

        cfg = tiny_pipeline()
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        params = {
            "unet": init_unet(ks[0], cfg.unet),
            "controlnet": init_controlnet(ks[1], cfg.controlnet),
            "vae": init_vae(ks[2], cfg.vae),
            "clip": init_clip_text(ks[3], cfg.clip),
        }
        tok = toy_tokenizer(vocab_size=cfg.clip.vocab_size,
                            max_length=cfg.clip.max_length)
        return Canny2ImagePipeline(params, tok, cfg, persistent_cache=False)

    from stablediffusioneo_tpu.config import sd15_pipeline
    from stablediffusioneo_tpu.checkpoint import (
        convert_clip, convert_controlnet, convert_unet, convert_vae,
        load_torch_state_dict,
    )
    from stablediffusioneo_tpu.models.tokenizer import CLIPTokenizer

    cfg = sd15_pipeline(dtype=args.dtype)
    raw = load_torch_state_dict(args.ckpt)
    params = {
        "unet": convert_unet(raw, cfg.unet),
        "controlnet": convert_controlnet(raw, cfg.controlnet),
        "vae": convert_vae(raw, cfg.vae),
        "clip": convert_clip(raw, cfg.clip),
    }
    tok = CLIPTokenizer(args.vocab, args.merges)
    return Canny2ImagePipeline(params, tok, cfg)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", help="control_sd15_canny.pth path")
    ap.add_argument("--vocab", help="CLIP vocab.json path")
    ap.add_argument("--merges", help="CLIP merges.txt path")
    ap.add_argument("--tiny", action="store_true",
                    help="random-weight tiny config (smoke/demo)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon TPU plugin's "
                         "sitecustomize overrides JAX_PLATFORMS, so the env "
                         "var alone does not stick)")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--buckets", default="1,2,4",
                    help="engine batch buckets, comma-separated")
    ap.add_argument("--wait-ms", type=float, default=25.0,
                    help="batching window (latency a lone request may pay)")
    ap.add_argument("--warmup-res", default="",
                    help="comma-separated resolutions to precompile, e.g. 512")
    ap.add_argument("--warmup-steps", type=int, default=20)
    args = ap.parse_args()
    if not args.tiny and not (args.ckpt and args.vocab and args.merges):
        ap.error("--ckpt/--vocab/--merges required (or use --tiny)")
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from stablediffusioneo_tpu.serving import DiffusionServer
    from stablediffusioneo_tpu.serving.http_api import make_http_server

    pipe = build_pipeline(args)
    buckets = tuple(int(b) for b in args.buckets.split(","))
    server = DiffusionServer(pipe, batch_buckets=buckets,
                             max_wait_ms=args.wait_ms).start()
    if args.warmup_res:
        res = tuple(int(r) for r in args.warmup_res.split(","))
        print(f"warmup: compiling {len(buckets)}x{len(res)} engines ...",
              flush=True)
        server.warmup(resolutions=res, steps=args.warmup_steps)
    httpd = make_http_server(server, host=args.host, port=args.port)
    print(f"serving on http://{args.host}:{httpd.server_address[1]} "
          f"(buckets {buckets}, wait {args.wait_ms} ms)", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        server.stop(drain=False)


if __name__ == "__main__":
    main()
