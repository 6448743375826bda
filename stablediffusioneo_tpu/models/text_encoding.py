"""Prompt-encoding front-end: standard 77-token path, long-prompt windowing,
and clip-skip.

Re-design of the reference's runtime hacks (cldm/hack.py):
  - `hack_everything`'s `_hacked_clip_forward` (hack.py:32-68): prompts
    tokenized WITHOUT truncation, split into three 75-token windows, each
    wrapped [BOS]+window+[EOS] and padded to 77, encoded in one batched
    CLIP call, concatenated to (B, 231, hidden);
  - `clip_skip`: hidden state -(skip) passed through the final LayerNorm
    instead of the last layer's output (hack.py:40-44);
  - `disable_verbosity` (hack.py:11-14) is irrelevant here (no transformers
    runtime dependency at inference).

TPU note: both paths are fixed-shape (77 or 3x77), so each maps to exactly
one compiled CLIP engine — no dynamic token-length profiles needed (the
analog of onnx2trt_dynamic.py's min/opt/max profile collapses to two
buckets).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.config import CLIPTextConfig
from stablediffusioneo_tpu.models.clip import clip_text_apply
from stablediffusioneo_tpu.models.tokenizer import CLIPTokenizer
from stablediffusioneo_tpu.ops.norms import layer_norm


def clip_text_apply_skip(
    params: dict, cfg: CLIPTextConfig, input_ids: jax.Array, clip_skip: int = 0
) -> jax.Array:
    """CLIP forward with clip_skip semantics: skip<=1 -> last_hidden_state;
    skip=k>1 -> final_layer_norm(hidden_states[-k])."""
    if clip_skip <= 1:
        return clip_text_apply(params, cfg, input_ids)
    # re-run the tower, capturing the -(k)th hidden state
    b, t = input_ids.shape
    x = jnp.take(params["token_embedding"], input_ids, axis=0)
    x = x + params["position_embedding"][None, :t, :].astype(x.dtype)
    causal = np.triu(np.full((t, t), -10000.0, np.float32), k=1)
    mask = jnp.asarray(causal)[None, None]
    from stablediffusioneo_tpu.models.clip import _self_attn

    hidden = [x]
    for p in params["layers"]:
        h = layer_norm(x, p["ln1"]["g"], p["ln1"]["b"], cfg.layer_norm_eps)
        x = x + _self_attn(p, cfg, h, mask)
        h = layer_norm(x, p["ln2"]["g"], p["ln2"]["b"], cfg.layer_norm_eps)
        from stablediffusioneo_tpu.models.clip import _act
        from stablediffusioneo_tpu.ops.layers import linear

        x = x + linear(_act(cfg)(linear(h, p["fc1"])), p["fc2"])
        hidden.append(x)
    target = hidden[-clip_skip]
    return layer_norm(
        target, params["final_ln"]["g"], params["final_ln"]["b"], cfg.layer_norm_eps
    )


def tokenize_windowed(
    tokenizer: CLIPTokenizer,
    texts: List[str],
    windows: int = 3,
    window_body: Optional[int] = None,
) -> np.ndarray:
    """Tokenize without truncation, split into `windows` x (window_body)
    chunks, wrap each with SOT/EOT, pad with EOT to max_length.
    Returns (B, windows, max_length) int32 (hack.py:46-61; window_body=75
    for the real 77-token CLIP)."""
    if window_body is None:
        window_body = tokenizer.max_length - 2
    out = np.full(
        (len(texts), windows, window_body + 2), tokenizer.eot, np.int32
    )
    for bi, text in enumerate(texts):
        raw = tokenizer.encode(text)
        for wi in range(windows):
            chunk = raw[window_body * wi : window_body * (wi + 1)]
            row = [tokenizer.sot] + chunk + [tokenizer.eot]
            out[bi, wi, : len(row)] = row
    return out


def needed_windows(
    tokenizer: CLIPTokenizer,
    texts: List[str],
    window_body: Optional[int] = None,
    max_windows: int = 3,
) -> int:
    """Minimal shared window count for `texts`: ceil(longest/75), clamped
    to [1, max_windows]. The single-window coverage gap of the two fixed
    buckets (78-127-token prompts, the reference's onnx2trt_dynamic 1-128
    profile range) lands in the 2-window ctx-154 bucket — CLIP's position
    table is 77 entries, so >77 tokens in ONE window is architecturally
    impossible for any implementation; windowing is the faithful analog."""
    if window_body is None:
        window_body = tokenizer.max_length - 2
    longest = max(len(tokenizer.encode(t)) for t in texts)
    return int(np.clip(-(-longest // window_body), 1, max_windows))


def encode_prompt_windowed(
    params: dict,
    cfg: CLIPTextConfig,
    tokenizer: CLIPTokenizer,
    texts: List[str],
    windows: int = 3,
    clip_skip: int = 0,
) -> jax.Array:
    """Long-prompt conditioning: (B, windows*77, hidden)."""
    ids = tokenize_windowed(tokenizer, texts, windows=windows)
    b, f, l = ids.shape
    feed = jnp.asarray(ids.reshape(b * f, l))
    y = clip_text_apply_skip(params, cfg, feed, clip_skip=clip_skip)
    return y.reshape(b, f * l, -1)


# ------------------------------------------------------- prompt emphasis

# A1111-style attention syntax (beyond the reference): "(x)" scales the
# fragment's conditioning by 1.1, "[x]" by 1/1.1, "(x:1.5)" by 1.5;
# groups nest multiplicatively; "\(" / "\[" are literals.
_EMPH_TOKEN = None  # lazy-compiled regex


def parse_prompt_attention(text: str):
    """-> [(fragment, weight)] with adjacent equal-weight fragments merged.

    Implements the emphasis grammar by scanning with a multiplier stack:
    '(' pushes x1.1, '[' pushes x(1/1.1), ':w)' rewrites the enclosing
    '(' group's multiplier to w, ')' / ']' pop. Escapes: '\\(' etc. emit
    the literal character."""
    import re as _re

    global _EMPH_TOKEN
    if _EMPH_TOKEN is None:
        # weight must be a well-formed float ('1', '1.5', '.5'); malformed
        # ':1..5)' falls through to the literal-text alternatives instead
        # of crashing float()
        _EMPH_TOKEN = _re.compile(
            r"\\[\\()\[\]]|\(|\)|\[|\]"
            r"|:\s*([+-]?(?:\d+(?:\.\d*)?|\.\d+))\s*\)"
            r"|[^\\()\[\]:]+|:")
    out = []          # [(fragment, weight)]
    stack = []        # (index into out at group start, kind)
    weight = 1.0

    def emit(s, w):
        if s:
            out.append([s, w])

    def rescale(start, factor):
        for item in out[start:]:
            item[1] *= factor

    for m in _EMPH_TOKEN.finditer(text):
        tok = m.group(0)
        if tok.startswith("\\"):
            emit(tok[1:], weight)
        elif tok == "(":
            stack.append((len(out), "("))
            weight *= 1.1
        elif tok == "[":
            stack.append((len(out), "["))
            weight /= 1.1
        elif m.group(1) is not None:  # ":w)" — explicit weight close
            if stack and stack[-1][1] == "(":
                start, _ = stack.pop()
                w = float(m.group(1))
                rescale(start, w / 1.1)  # replace the provisional 1.1
                weight /= 1.1  # group closed; outer weight restored
            else:
                emit(tok, weight)
        elif tok == ")":
            if stack and stack[-1][1] == "(":
                stack.pop()
                weight /= 1.1
            else:
                emit(tok, weight)
        elif tok == "]":
            if stack and stack[-1][1] == "[":
                stack.pop()
                weight *= 1.1
            else:
                emit(tok, weight)
        else:
            emit(tok, weight)
    # unclosed groups: keep their provisional multiplier (A1111 behavior)
    merged = []
    for s, w in out:
        if merged and abs(merged[-1][1] - w) < 1e-9:
            merged[-1][0] += s
        else:
            merged.append([s, w])
    return [(s, w) for s, w in merged] or [("", 1.0)]


def tokenize_weighted(tokenizer: CLIPTokenizer, texts: List[str]):
    """-> (ids (B, L) int32, weights (B, L) f32): per-token emphasis
    weights aligned with the padded token grid (SOT/EOT/pad = 1.0)."""
    L = tokenizer.max_length
    ids = np.full((len(texts), L), tokenizer.eot, np.int32)
    weights = np.ones((len(texts), L), np.float32)
    for i, text in enumerate(texts):
        toks, ws = [], []
        for frag, w in parse_prompt_attention(text):
            t = tokenizer.encode(frag)
            toks.extend(t)
            ws.extend([w] * len(t))
        toks, ws = toks[: L - 2], ws[: L - 2]
        ids[i, 0] = tokenizer.sot
        ids[i, 1:1 + len(toks)] = toks
        ids[i, 1 + len(toks)] = tokenizer.eot
        weights[i, 1:1 + len(ws)] = ws
    return ids, weights


def apply_emphasis(ctx: jax.Array, weights: np.ndarray) -> jax.Array:
    """Scale hidden states by per-token weights, then restore each row's
    original mean (the A1111 recipe: emphasis shifts direction, not the
    overall conditioning magnitude). weights == 1 is an exact no-op."""
    if np.allclose(weights, 1.0):
        return ctx
    w = jnp.asarray(weights)[..., None]
    orig_mean = jnp.mean(ctx.astype(jnp.float32), axis=(1, 2), keepdims=True)
    z = ctx.astype(jnp.float32) * w
    new_mean = jnp.mean(z, axis=(1, 2), keepdims=True)
    return (z * (orig_mean / new_mean)).astype(ctx.dtype)
