"""LoRA adapters: low-rank fine-tuning of attention/MLP linears
(arXiv:2106.09685).

Beyond the reference's training surface (it fine-tunes the full ControlNet
branch with AdamW, cldm/cldm.py:416-423): LoRA trains rank-r factor pairs
on top of FROZEN base weights — w' = w + (alpha/r) * a @ b — cutting the
trainable/optimizer footprint by two to three orders of magnitude.

TPU-first design:
  - Adapters live in a sparse pytree mirroring the base param tree, so the
    whole thing jits/shards/checkpoints with the existing machinery
    (optax sees only the adapter leaves; AdamW moments are rank-r too).
  - The train step merges in-graph: one (in,r)x(r,out) matmul per site per
    step. XLA schedules the rank-r outer product alongside the consuming
    dense matmul; at SD scale the overhead is <1% of step FLOPs.
  - Inference pays ZERO runtime cost: `merge_lora` folds the adapters into
    the dense weights ahead of engine execution (same shapes/dtypes ->
    the AOT engines are reused as-is; `CNSDRuntime.apply_lora` merges into
    the resident device tree without recompiling).

Naming: a site is the param dict of one linear layer (holding "w" and
optionally "b"); targets select sites by their dict key in the tree
("wq"/"wk"/"wv"/"wo" attention projections, "ff1"/"ff2" MLP linears —
models/unet.py:74-88 naming, shared by CLIP via q/k/v/out + fc1/fc2).
"""

from __future__ import annotations

import json
import math
from typing import Dict, Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# attention projections + MLP linears, UNet and CLIP naming
DEFAULT_TARGETS = (
    "wq", "wk", "wv", "wo", "ff1", "ff2",   # models/unet.py transformer blocks
    "q", "k", "v", "out", "fc1", "fc2",     # models/clip.py layers
)


def lora_sites(
    params: Dict, targets: Sequence[str] = DEFAULT_TARGETS
) -> Tuple[Tuple[str, ...], ...]:
    """Paths (key tuples) of every targeted linear site in `params`.

    A site qualifies when its dict key is in `targets` and it holds a 2-D
    "w" leaf (conv kernels are 4-D and never match)."""
    out = []

    def walk(tree, path):
        if isinstance(tree, (list, tuple)):
            for i, v in enumerate(tree):
                walk(v, path + (i,))
            return
        if not isinstance(tree, dict):
            return
        w = tree.get("w")
        if (path and path[-1] in targets and w is not None
                and getattr(w, "ndim", 0) == 2):
            out.append(path)
            return
        for k in sorted(tree):
            walk(tree[k], path + (k,))

    walk(params, ())
    return tuple(out)


def init_lora(
    key: jax.Array,
    params: Dict,
    rank: int = 8,
    targets: Sequence[str] = DEFAULT_TARGETS,
    dtype=jnp.float32,
) -> Dict:
    """Sparse adapter tree: {"a": (in, r) N(0, 1/r), "b": (r, out) zeros}
    at every targeted site (zero "b" => merge is the identity at init, the
    standard LoRA warm start)."""
    sites = lora_sites(params, targets)
    if not sites:
        raise ValueError(f"no LoRA sites matched targets {targets}")
    keys = jax.random.split(key, len(sites))
    tree: Dict = {}
    for k, path in zip(keys, sites):
        node = tree
        for name in path[:-1]:
            node = node.setdefault(name, {})
        w = params
        for name in path:
            w = w[name]
        cin, cout = w["w"].shape
        node[path[-1]] = {
            "a": (jax.random.normal(k, (cin, rank), dtype)
                  / math.sqrt(rank)),
            "b": jnp.zeros((rank, cout), dtype),
        }
    return tree


def merge_lora(params: Dict, lora: Dict, scale: float = 1.0) -> Dict:
    """params with w' = w + scale * a @ b at every adapter site.

    The outer product accumulates in f32 and casts back to the base
    weight's dtype; non-adapted leaves are returned by reference (no
    copy). Strict accounting: every adapter site must land on a matching
    linear in `params` — a mismatched tree (e.g. a controlnet adapter
    merged into the unet) fails loudly naming the orphan sites instead of
    silently part-merging."""
    merged_paths = set()

    def walk(p, l, path):
        if isinstance(p, (list, tuple)):
            return type(p)(
                walk(v, l[i], path + (i,)) if i in l else v
                for i, v in enumerate(p))
        if "a" in l and "b" in l and not isinstance(l["a"], dict):
            if not (isinstance(p, dict) and "w" in p
                    and getattr(p["w"], "ndim", 0) == 2
                    and p["w"].shape == (l["a"].shape[0], l["b"].shape[1])):
                raise ValueError(
                    f"merge_lora: adapter site {'/'.join(map(str, path))} "
                    "does not match a linear of the right shape in the "
                    "target tree")
            merged_paths.add(path)
            delta = (l["a"].astype(jnp.float32)
                     @ l["b"].astype(jnp.float32)) * scale
            return {**p, "w": (p["w"].astype(jnp.float32)
                               + delta).astype(p["w"].dtype)}
        return {k: walk(p[k], l[k], path + (k,)) if k in l else p[k]
                for k in p}

    out = walk(params, lora, ())
    orphans = [
        "/".join(map(str, q)) for q in _site_paths(lora)
        if q not in merged_paths
    ]
    if orphans:
        raise ValueError(
            f"merge_lora: {len(orphans)} adapter site(s) have no matching "
            f"path in the target tree (wrong 'on' tree?): {orphans[:5]}")
    return out


def count_params(tree: Dict) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def n_sites(lora: Dict) -> int:
    """Number of adapter sites in a LoRA tree."""
    return sum(1 for _ in _site_paths(lora))


# ------------------------------------------------------------- train step


def lora_train_step(
    state,
    tx,
    frozen: Dict[str, Dict],
    cfg,
    sqrt_abar: jax.Array,
    sqrt_one_minus_abar: jax.Array,
    batch: Dict[str, jax.Array],
    key: jax.Array,
    on: str = "controlnet",
    scale: float = 1.0,
):
    """One AdamW step on a LoRA tree riding the frozen pipeline.

    `state.params` is the adapter tree (training/trainer.py TrainState);
    `frozen` holds the full {"unet", "controlnet"} base trees; `on` picks
    which tree the adapters merge into. Reuses `diffusion_loss` — the merge
    happens inside the differentiated function, so grads flow only through
    the rank-r factors."""
    from stablediffusioneo_tpu.training.trainer import (
        TrainState, diffusion_loss,
    )

    b = batch["x0"].shape[0]
    if batch["hint"].dtype == jnp.uint8:
        batch = dict(batch)
        batch["hint"] = (batch["hint"].astype(jnp.float32)
                         / 255.0).astype(batch["x0"].dtype)
    kt, kn = jax.random.split(jax.random.fold_in(key, state.step))
    t = jax.random.randint(kt, (b,), 0, cfg.diffusion.timesteps)
    noise = jax.random.normal(
        kn, batch["x0"].shape, jnp.float32).astype(batch["x0"].dtype)

    def loss_fn(lora):
        merged = dict(frozen)
        merged[on] = merge_lora(frozen[on], lora, scale)
        return diffusion_loss(
            merged["controlnet"], merged["unet"], cfg,
            sqrt_abar, sqrt_one_minus_abar,
            batch["x0"], batch["hint"], batch["ctx"], t, noise,
        )

    import optax

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(new_params, new_opt, state.step + 1), loss


# ------------------------------------------------------------- save / load


def save_lora(path: str, lora: Dict, alpha: float, rank: Optional[int] = None,
              on: str = "controlnet") -> str:
    """Single-file .npz: flat "/"-joined keys + a JSON metadata record."""
    flat = {}

    def walk(tree, prefix):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, prefix + (k,))
            else:
                flat["/".join(str(x) for x in prefix + (k,))] = np.asarray(v)

    walk(lora, ())
    if rank is None:
        rank = next(iter(flat.values())).shape[-1] if flat else 0
    meta = json.dumps({"format": "sdeo-lora-v1", "alpha": alpha,
                       "rank": rank, "on": on})
    np.savez(path, __meta__=np.frombuffer(meta.encode(), np.uint8), **flat)
    return path


def load_lora(path: str) -> Tuple[Dict, dict]:
    """Returns (adapter tree, metadata). Strict accounting: every stored
    key must parse into the tree and every site must hold exactly
    {"a", "b"} — a malformed or foreign file fails loudly naming the
    offending keys (checkpoint/accounting.py discipline)."""
    z = np.load(path)
    files = set(z.files)
    if "__meta__" not in files:
        raise ValueError(f"{path}: not an sdeo-lora file (no __meta__)")
    meta = json.loads(bytes(z["__meta__"]).decode())
    if meta.get("format") != "sdeo-lora-v1":
        raise ValueError(f"{path}: unknown lora format {meta.get('format')!r}")
    tree: Dict = {}
    for key in sorted(files - {"__meta__"}):
        parts = [int(p) if p.isdigit() else p for p in key.split("/")]
        if parts[-1] not in ("a", "b"):
            raise ValueError(f"{path}: unexpected leaf {key!r} "
                             "(sites hold exactly 'a'/'b')")
        node = tree
        for name in parts[:-1]:
            node = node.setdefault(name, {})
        node[parts[-1]] = jnp.asarray(z[key])
    bad = [p for p in _site_paths(tree)
           if set(_get(tree, p)) != {"a", "b"}]
    if bad:
        raise ValueError(f"{path}: incomplete adapter sites {bad}")
    return tree, meta


def _site_paths(tree: Dict, path=()) -> Iterable[Tuple[str, ...]]:
    if any(not isinstance(v, dict) for v in tree.values()):
        yield path
        return
    for k, v in tree.items():
        yield from _site_paths(v, path + (k,))


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree
