"""Dump the optimized HLO of the fused sample+decode engine (512px, 20-step)
and summarize the expensive fusion families seen in the xplane profile
(convert_multiply_fusion, add_add_fusion, copies) with their producers and
consumers — the evidence base for norm/residual layout work.

Usage: python scripts/dump_hlo.py [out.txt] [--grep NAME]
"""

import os
import re
import sys

try:
    import stablediffusioneo_tpu  # noqa: F401 — installed or on PYTHONPATH
except ImportError:  # repo checkout without `pip install -e .`
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sdeo_hlo.txt"
    import numpy as np
    import jax
    import jax.numpy as jnp

    from stablediffusioneo_tpu.config import sd15_pipeline
    from stablediffusioneo_tpu.models import (
        init_clip_text, init_controlnet, init_unet, init_vae,
    )
    from stablediffusioneo_tpu.runtime.engine import CNSDRuntime

    cfg = sd15_pipeline(dtype="bfloat16")
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    shapes = {
        "unet": jax.eval_shape(lambda k: init_unet(k, cfg.unet), ks[0]),
        "controlnet": jax.eval_shape(lambda k: init_controlnet(k, cfg.controlnet), ks[1]),
        "vae": jax.eval_shape(lambda k: init_vae(k, cfg.vae), ks[2]),
        "clip": jax.eval_shape(lambda k: init_clip_text(k, cfg.clip), ks[3]),
    }
    params = jax.jit(lambda: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes))()
    rt = CNSDRuntime(params, cfg)
    eng = rt.sample_decode_engine(num_steps=20, batch=1, h=512, w=512,
                                  guess_mode=False)
    txt = eng._compiled.as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out_path}")

    # summary: fusion families
    lines = txt.splitlines()
    fams = {}
    for ln in lines:
        m = re.search(r"%(\w+?_fusion[\w.]*|fusion[\w.]*) = ", ln)
        if m:
            fam = re.sub(r"[.\d]+$", "", m.group(1))
            fams[fam] = fams.get(fam, 0) + 1
    for fam, n in sorted(fams.items(), key=lambda kv: -kv[1]):
        print(f"{n:6d}  {fam}")


if __name__ == "__main__":
    main()
