"""Textual inversion: inject learned concept embeddings into the CLIP
text tower (beyond the reference — the standard companion of ControlNet
deployments; An Image is Worth One Word, arXiv:2208.01618).

A concept is (k, d) embedding vectors for a placeholder word. Injection
appends the vectors to the token-embedding table and registers the
placeholder with the tokenizer so it encodes to the k new ids — the rest
of the text tower is untouched, so a concept composes with any prompt,
window bucket, and clip_skip setting.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np


def load_concept(path: str) -> Dict[str, np.ndarray]:
    """Read a textual-inversion file -> {placeholder: (k, d) f32}.

    Supported layouts:
      - A1111/sd-concepts .pt/.bin: {"string_to_param": {"*": (k, d)},
        "name": str} (torch pickle)
      - diffusers .pt/.bin: {token: (d,) or (k, d)} (torch pickle)
      - ours: .npz with one array per placeholder
    """
    if path.endswith(".npz"):
        z = np.load(path)
        return {k: np.atleast_2d(np.asarray(z[k], np.float32))
                for k in z.files}
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if "string_to_param" in obj:
        name = obj.get("name") or "<concept>"
        table = obj["string_to_param"]
        vec = table.get("*", next(iter(table.values())))
        return {name: np.atleast_2d(vec.detach().float().numpy())}
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            out[k] = np.atleast_2d(v.detach().float().numpy())
    if not out:
        raise ValueError(f"{path}: no embedding tensors found "
                         "(expected string_to_param or token->tensor)")
    return out


def add_concepts(clip_params: Dict, tokenizer, concepts: Dict) -> Dict:
    """Append each concept's vectors to the token-embedding table and
    register its placeholder with the tokenizer. Returns the new clip
    param tree (the embedding table is copied; everything else is shared).

    Vector width must match the tower's hidden size — a mismatched file
    (e.g. an SDXL embedding into SD-1.5) fails loudly."""
    emb = clip_params["token_embedding"]
    d = emb.shape[1]
    rows = [emb]
    base = emb.shape[0]
    for word, vecs in sorted(concepts.items()):
        vecs = jnp.asarray(vecs, emb.dtype)
        if vecs.ndim != 2 or vecs.shape[1] != d:
            raise ValueError(
                f"concept {word!r}: vectors {vecs.shape} do not match the "
                f"text tower's hidden size {d}")
        tokenizer.add_placeholder(word, list(range(base, base + vecs.shape[0])))
        rows.append(vecs)
        base += vecs.shape[0]
    return {**clip_params, "token_embedding": jnp.concatenate(rows, axis=0)}


def apply_textual_inversion(runtime, tokenizer, concepts: Dict) -> int:
    """Inject concepts into a LIVE runtime: grows the resident CLIP
    embedding table and evicts the compiled CLIP engines (their abstract
    param shapes changed; they recompile lazily at the new vocab size —
    the samplers/decoders are untouched). Returns the number of new rows."""
    new_clip = add_concepts(runtime.params["clip"], tokenizer, concepts)
    import jax

    if runtime.mesh is not None:
        from stablediffusioneo_tpu.parallel.mesh import shard_params

        new_clip = shard_params(new_clip, runtime.mesh)
    else:
        new_clip = jax.device_put(new_clip)
    runtime.params = {**runtime.params, "clip": new_clip}
    for key in [k for k in runtime._engines if k[0] == "clip"]:
        del runtime._engines[key]
    return sum(np.atleast_2d(v).shape[0] for v in concepts.values())
