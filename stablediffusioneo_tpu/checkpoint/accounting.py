"""Conversion key accounting: exhaustive state-dict consumption gates.

The reference validates every conversion boundary by re-executing it and
comparing outputs (`onnxruntime_check`, export_onnx_all.py:60-100). In a
zero-egress environment the strongest real-weight proxy available is *key
accounting*: wrap the source state dict in a read-tracking view, run the
converter, and demand that

  1. every key in the converter's scope is consumed (or matches a
     documented known-unused pattern) — a misread of upstream naming then
     fails loudly, naming the orphan keys, instead of silently leaving
     weights behind;
  2. the converted tree has exactly the structure and leaf shapes of the
     framework's own `init_*` tree — catching the reverse failure, where a
     converter fabricates the wrong tree out of the right keys.

Missing keys already fail hard (converters index `sd[...]` directly), so
the three failure directions (orphan source keys, malformed target tree,
absent source keys) are all loud.

Usage:
    rep = account(convert_unet, sd, cfg.unet, prefix="model.diffusion_model.",
                  scope_prefix="model.diffusion_model.",
                  expect=jax.eval_shape(lambda k: init_unet(k, cfg.unet), key))
    rep.assert_complete("unet")
    params = rep.tree
"""

from __future__ import annotations

import re
from collections import Counter
from collections.abc import Mapping
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

__all__ = [
    "TrackedStateDict",
    "PrefixView",
    "ConversionReport",
    "ConversionAccountingError",
    "account",
    "account_pipeline",
    "structure_diff",
    "SD_KNOWN_UNUSED",
]


class TrackedStateDict(Mapping):
    """Read-tracking view over a state dict. Only ``__getitem__`` (and the
    ``items()``/``values()`` iterators, which go through it) counts as
    consumption; key iteration and ``in`` checks are free, so converters can
    probe for optional keys (e.g. ``nin_shortcut``) without false reads."""

    def __init__(self, sd: Mapping):
        self._sd = sd
        self.reads: Counter = Counter()

    def __getitem__(self, k):
        v = self._sd[k]
        self.reads[k] += 1
        return v

    def __contains__(self, k):
        return k in self._sd

    def __iter__(self):
        return iter(self._sd)

    def __len__(self):
        return len(self._sd)

    def items(self):
        for k in self._sd:
            yield k, self[k]

    def values(self):
        for k in self._sd:
            yield self[k]


class PrefixView(Mapping):
    """Prefix-stripping view that forwards reads to the parent mapping, so
    tracking survives the converters' internal ``_strip`` step."""

    def __init__(self, sd: Mapping, prefix: str):
        self._sd = sd
        self._prefix = prefix
        self._keys = [k[len(prefix):] for k in sd if k.startswith(prefix)]

    def __getitem__(self, k):
        return self._sd[self._prefix + k]

    def __contains__(self, k):
        return (self._prefix + k) in self._sd

    def __iter__(self):
        return iter(self._keys)

    def __len__(self):
        return len(self._keys)


class ConversionAccountingError(RuntimeError):
    pass


def _leaf_shape(x) -> Tuple[int, ...]:
    return tuple(getattr(x, "shape", ()))


def structure_diff(tree: Any, expect: Any) -> Dict[str, list]:
    """Compare two pytrees by path and leaf shape (dtype ignored: converters
    may cast while init trees stay f32). Returns dict of sorted lists:
    ``missing`` (paths in expect only), ``extra`` (paths in tree only),
    ``shape_mismatch`` ("path: got-vs-want" strings)."""
    import jax

    def paths(t):
        flat, _ = jax.tree_util.tree_flatten_with_path(t)
        return {jax.tree_util.keystr(p): _leaf_shape(v) for p, v in flat}

    got, want = paths(tree), paths(expect)
    return {
        "missing": sorted(set(want) - set(got)),
        "extra": sorted(set(got) - set(want)),
        "shape_mismatch": sorted(
            f"{p}: {got[p]} vs {want[p]}"
            for p in set(got) & set(want)
            if got[p] != want[p]
        ),
    }


@dataclass
class ConversionReport:
    tree: Any
    consumed: set
    orphans: set            # in scope, never read, no ignore pattern
    ignored: set            # in scope, never read, matched a documented pattern
    multi_reads: Dict[str, int] = field(default_factory=dict)
    structure: Optional[Dict[str, list]] = None  # from structure_diff

    @property
    def complete(self) -> bool:
        return not self.orphans and not (
            self.structure
            and any(self.structure[k] for k in ("missing", "extra", "shape_mismatch"))
        )

    def assert_complete(self, name: str = "converter") -> "ConversionReport":
        problems = []
        if self.orphans:
            show = sorted(self.orphans)
            head = ", ".join(show[:15])
            more = f" (+{len(show) - 15} more)" if len(show) > 15 else ""
            problems.append(
                f"{len(show)} source keys never consumed: {head}{more}"
            )
        if self.structure:
            for kind in ("missing", "extra", "shape_mismatch"):
                bad = self.structure[kind]
                if bad:
                    head = ", ".join(bad[:10])
                    more = f" (+{len(bad) - 10} more)" if len(bad) > 10 else ""
                    problems.append(f"{len(bad)} tree paths {kind}: {head}{more}")
        if problems:
            raise ConversionAccountingError(
                f"[{name}] incomplete conversion:\n  " + "\n  ".join(problems)
            )
        return self


def _split_unread(
    unread: set, ignore: Sequence[str]
) -> Tuple[set, set]:
    pats = [re.compile(p) for p in ignore]
    ignored = {k for k in unread if any(p.fullmatch(k) for p in pats)}
    return unread - ignored, ignored


def account(
    convert_fn: Callable,
    sd: Mapping,
    *args,
    scope_prefix: str = "",
    ignore: Sequence[str] = (),
    expect: Any = None,
    **kwargs,
) -> ConversionReport:
    """Run ``convert_fn(tracked_sd, *args, **kwargs)`` and account for every
    source key under ``scope_prefix``. ``ignore`` is a sequence of regexes
    (fullmatch, against the un-stripped key) for keys that are *documented*
    as unused. ``expect`` (optional) is a pytree of shape structs — usually
    ``jax.eval_shape`` of the matching ``init_*`` — checked via
    :func:`structure_diff`."""
    tracker = TrackedStateDict(sd)
    tree = convert_fn(tracker, *args, **kwargs)
    scope = {k for k in sd if k.startswith(scope_prefix)}
    consumed = set(tracker.reads) & scope
    orphans, ignored = _split_unread(scope - consumed, ignore)
    return ConversionReport(
        tree=tree,
        consumed=consumed,
        orphans=orphans,
        ignored=ignored,
        multi_reads={k: n for k, n in tracker.reads.items() if n > 1},
        structure=structure_diff(tree, expect) if expect is not None else None,
    )


# --------------------------------------------------------- full SD pipeline

# Keys a full ControlNet/SD checkpoint carries that the rebuild derives or
# has no use for. Each entry documents why it is safe to leave behind.
SD_KNOWN_UNUSED: Tuple[str, ...] = (
    # DDPM schedule buffers registered by LatentDiffusion — pure functions of
    # (timesteps, linear_start, linear_end); ops/schedule.py recomputes them
    # from the config, so the serialized copies are redundant.
    r"betas",
    r"alphas_cumprod",
    r"alphas_cumprod_prev",
    r"sqrt_alphas_cumprod",
    r"sqrt_one_minus_alphas_cumprod",
    r"log_one_minus_alphas_cumprod",
    r"sqrt_recip_alphas_cumprod",
    r"sqrt_recipm1_alphas_cumprod",
    r"posterior_variance",
    r"posterior_log_variance_clipped",
    r"posterior_mean_coef1",
    r"posterior_mean_coef2",
    # per-timestep loss log-variances (training-only; reference never reads
    # them at inference either)
    r"logvar",
    # EMA shadow params (training artifact; the live weights are canonical)
    r"model_ema\..*",
    # HF CLIPTextModel registers position_ids as a persistent int buffer;
    # the rebuild uses a static arange.
    r"cond_stage_model\.transformer\.text_model\.embeddings\.position_ids",
    # OpenCLIP towers (SD-2.x) serialize the causal mask and, for the full
    # model, vision/logit towers the text pipeline never touches.
    r"cond_stage_model\.model\.attn_mask",
    r"cond_stage_model\.model\.text_projection",
    r"cond_stage_model\.model\.logit_scale",
)


def account_pipeline(
    sd: Mapping,
    cfg=None,
    dtype=None,
    expect: Optional[Dict[str, Any]] = None,
) -> ConversionReport:
    """Account a FULL ControlNet checkpoint across all four converters with
    one shared tracker: every key must be consumed by exactly one converter
    or match :data:`SD_KNOWN_UNUSED`. This is the strict path behind
    ``load_controlnet_pipeline(strict=True)`` and ``scripts/readiness.py``.

    ``expect`` maps model name -> eval_shape tree (any subset of
    unet/controlnet/vae/clip)."""
    from stablediffusioneo_tpu.checkpoint.convert import (
        convert_clip,
        convert_controlnet,
        convert_unet,
        convert_vae,
    )
    from stablediffusioneo_tpu.config import sd15_pipeline

    cfg = cfg or sd15_pipeline()
    tracker = TrackedStateDict(sd)
    tree = {
        "unet": convert_unet(tracker, cfg.unet, dtype=dtype),
        "controlnet": convert_controlnet(tracker, cfg.controlnet, dtype=dtype),
        "vae": convert_vae(tracker, cfg.vae, dtype=dtype),
        "clip": convert_clip(tracker, cfg.clip, dtype=dtype),
    }
    consumed = set(tracker.reads)
    orphans, ignored = _split_unread(set(sd) - consumed, SD_KNOWN_UNUSED)
    structure = None
    if expect:
        structure = {"missing": [], "extra": [], "shape_mismatch": []}
        for name, want in expect.items():
            d = structure_diff(tree[name], want)
            for kind in structure:
                structure[kind].extend(f"{name}{p}" for p in d[kind])
            structure = {k: sorted(v) for k, v in structure.items()}
    return ConversionReport(
        tree=tree,
        consumed=consumed,
        orphans=orphans,
        ignored=ignored,
        multi_reads={k: n for k, n in tracker.reads.items() if n > 1},
        structure=structure,
    )
