"""Tour of every parallelism axis on an 8-device virtual CPU mesh:
dp (batch), tp (Megatron tensor), sp (spatial — one image's latent rows),
FSDP (ZeRO-3 training state), and pp (GPipe over a conditioner tower).

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python examples/multichip_tour.py   (~4 min CPU)

On real hardware the SAME code runs over ICI — swap the virtual devices
for `jax.devices()` and the mesh shapes for your slice topology
(docs/deployment.md). The reference has no working analog: its dist
utils are unused vendored torch DDP helpers (SURVEY.md §2 #37).
"""

import os
import sys

# This tour IS a virtual-mesh demo: force the 8-device CPU platform
# regardless of ambient env (a tunneled single-TPU env can't host it).
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if jax.config.jax_platforms != "cpu":
    jax.config.update("jax_platforms", "cpu")  # the axon plugin overrides env

import jax.numpy as jnp
import numpy as np

from stablediffusioneo_tpu.config import tiny_pipeline
from stablediffusioneo_tpu.models import (
    init_clip_text,
    init_controlnet,
    init_unet,
    init_vae,
)
from stablediffusioneo_tpu.models.clip import clip_text_apply, clip_text_apply_pp
from stablediffusioneo_tpu.models.tokenizer import toy_tokenizer
from stablediffusioneo_tpu.parallel import (
    fsdp_shard_params,
    make_mesh,
    pp_shard_params,
    stack_layer_params,
)
from stablediffusioneo_tpu.pipeline.canny2image import Canny2ImagePipeline

assert len(jax.devices()) >= 8, "needs 8 (virtual) devices — see docstring"

cfg = tiny_pipeline()
ks = jax.random.split(jax.random.PRNGKey(0), 4)
params = jax.device_get({
    "unet": init_unet(ks[0], cfg.unet),
    "controlnet": init_controlnet(ks[1], cfg.controlnet),
    "vae": init_vae(ks[2], cfg.vae),
    "clip": init_clip_text(ks[3], cfg.clip),
})
tok = toy_tokenizer(vocab_size=cfg.clip.vocab_size,
                    max_length=cfg.clip.max_length)
src = np.zeros((64, 64, 3), np.uint8)
src[20:44, 20:44] = 230
ARGS = dict(num_samples=4, image_resolution=64, ddim_steps=2,
            guess_mode=False, strength=1.0, scale=7.5, seed=1, eta=0.0,
            low_threshold=100, high_threshold=200)

# ---- dp x tp: batch shards over dp; attention/MLP channels shard over tp
# (Megatron — GSPMD inserts one psum per block from the param shardings).
mesh = make_mesh(dp=4, tp=2)
pipe = Canny2ImagePipeline(params, tok, cfg, persistent_cache=False,
                           mesh=mesh)
outs = pipe.process(src, "a cube", "", "", **ARGS)
print(f"dp=4 x tp=2 process OK: {len(outs)-1} images {outs[1].shape}")

# ---- + sp: one image's latent ROWS shard across chips — the batch-1
# latency axis. Conv halos / norm moments / token-sharded attention all
# propagate from the single input annotation.
mesh_sp = make_mesh(dp=2, tp=2, sp=2)
pipe_sp = Canny2ImagePipeline(params, tok, cfg, persistent_cache=False,
                              mesh=mesh_sp)
outs_sp = pipe_sp.process(src, "a cube", "", "", **ARGS)
d = max(np.abs(a.astype(int) - b.astype(int)).max()
        for a, b in zip(outs[1:], outs_sp[1:]))
print(f"dp=2 x sp=2 x tp=2 process OK: max |diff| vs dp x tp = {d}")

# ---- FSDP: ZeRO-3 — params/grads/optimizer moments each hold 1/dp of
# the tree per device; GSPMD inserts the gathers/reduce-scatters.
mesh_f = make_mesh(dp=8, tp=1)
unet_f = fsdp_shard_params(params["unet"], mesh_f)
n_shard = sum(1 for l in jax.tree.leaves(unet_f)
              if "dp" in jax.tree.leaves(l.sharding.spec or [None]) or
              (l.sharding.spec and "dp" in l.sharding.spec))
print(f"FSDP dp=8: {n_shard} param leaves sharded over dp "
      f"(training/loop.py train_step consumes this tree unchanged)")

# ---- pp: GPipe over the CLIP tower — stage weights live only on their
# own devices; microbatches flow stage-to-stage via ppermute inside one
# compiled scan. (The UNet is never pipelined: skip connections would
# carry the whole encoder activation set across every cut.)
mesh_pp = make_mesh(dp=2, tp=2, pp=2)
ids = np.zeros((4, cfg.clip.max_length), np.int32)
ids[:, :3] = [[5, 9, 2]] * 4
pre = dict(params["clip"])
pre["layers"] = pp_shard_params(stack_layer_params(pre["layers"]), mesh_pp)
z_pp = clip_text_apply_pp(pre, cfg.clip, jnp.asarray(ids), mesh_pp)
z_seq = clip_text_apply(params["clip"], cfg.clip, jnp.asarray(ids))
print(f"pp=2 x dp=2 x tp=2 GPipe CLIP tower: max err "
      f"{float(jnp.abs(z_pp - z_seq).max()):.2e} vs sequential")

print("multichip tour complete — all five axes exercised")
