"""OpenPose body/hand pose annotator — JAX models + numpy decode.

Re-design of the reference's CMU pose stack (annotator/openpose/):
  - `bodypose_model` (model.py:24-130): VGG-ish trunk then 6 refinement
    stages with two branches — PAFs (38ch, "L1") and part heatmaps (19ch,
    "L2") — each stage consuming concat(paf, heat, trunk features);
  - `handpose_model` (model.py:131-219): trunk + 6 stages -> 22 heatmaps;
  - `Body.__call__` (body.py:24-219): multi-scale inference, gaussian
    peak-finding, PAF line-integral limb scoring, greedy limb matching and
    person assembly;
  - `Hand.__call__` (hand.py), `util.draw_bodypose`/`draw_handpose`.

The nets here are spec-driven functional JAX (a table of conv specs, not a
module graph); weights load 1:1 from the upstream `body_pose_model.pth` /
`hand_pose_model.pth` state dicts. The decode is a clean-room
implementation of the public CMU PAF algorithm (Cao et al., CVPR'17).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.ops.layers import conv2d, conv_init

# ---------------------------------------------------------------- net specs

# (name, cin, cout, kernel, pad, relu)
_BODY_TRUNK = [
    ("conv1_1", 3, 64, 3, 1, True), ("conv1_2", 64, 64, 3, 1, True), ("pool", 0, 0, 0, 0, False),
    ("conv2_1", 64, 128, 3, 1, True), ("conv2_2", 128, 128, 3, 1, True), ("pool", 0, 0, 0, 0, False),
    ("conv3_1", 128, 256, 3, 1, True), ("conv3_2", 256, 256, 3, 1, True),
    ("conv3_3", 256, 256, 3, 1, True), ("conv3_4", 256, 256, 3, 1, True), ("pool", 0, 0, 0, 0, False),
    ("conv4_1", 256, 512, 3, 1, True), ("conv4_2", 512, 512, 3, 1, True),
    ("conv4_3_CPM", 512, 256, 3, 1, True), ("conv4_4_CPM", 256, 128, 3, 1, True),
]


def _stage1_spec(branch: str, cout: int):
    return [
        (f"conv5_1_CPM_{branch}", 128, 128, 3, 1, True),
        (f"conv5_2_CPM_{branch}", 128, 128, 3, 1, True),
        (f"conv5_3_CPM_{branch}", 128, 128, 3, 1, True),
        (f"conv5_4_CPM_{branch}", 128, 512, 1, 0, True),
        (f"conv5_5_CPM_{branch}", 512, cout, 1, 0, False),
    ]


def _stageN_spec(stage: int, branch: str, cin: int, cout: int):
    return [
        (f"Mconv1_stage{stage}_{branch}", cin, 128, 7, 3, True),
        (f"Mconv2_stage{stage}_{branch}", 128, 128, 7, 3, True),
        (f"Mconv3_stage{stage}_{branch}", 128, 128, 7, 3, True),
        (f"Mconv4_stage{stage}_{branch}", 128, 128, 7, 3, True),
        (f"Mconv5_stage{stage}_{branch}", 128, 128, 7, 3, True),
        (f"Mconv6_stage{stage}_{branch}", 128, 128, 1, 0, True),
        (f"Mconv7_stage{stage}_{branch}", 128, cout, 1, 0, False),
    ]


def _run_spec(params: Dict, prefix: str, spec, x):
    pool_i = 0
    for item in spec:
        name, cin, cout, k, pad, relu = item
        if name == "pool":
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            pool_i += 1
            continue
        x = conv2d(x, params[f"{prefix}{name}"], padding=pad)
        if relu:
            x = jax.nn.relu(x)
    return x


def _init_spec(key, spec, prefix):
    params = {}
    ks = iter(jax.random.split(key, len(spec) + 1))
    for name, cin, cout, k, pad, relu in spec:
        if name == "pool":
            continue
        params[f"{prefix}{name}"] = conv_init(next(ks), k, k, cin, cout)
    return params


def init_body(key) -> Dict:
    ks = iter(jax.random.split(key, 16))
    params = _init_spec(next(ks), _BODY_TRUNK, "model0.")
    params.update(_init_spec(next(ks), _stage1_spec("L1", 38), "model1_1."))
    params.update(_init_spec(next(ks), _stage1_spec("L2", 19), "model1_2."))
    for s in range(2, 7):
        params.update(
            _init_spec(next(ks), _stageN_spec(s, "L1", 185, 38), f"model{s}_1.")
        )
        params.update(
            _init_spec(next(ks), _stageN_spec(s, "L2", 185, 19), f"model{s}_2.")
        )
    return params


def convert_body(sd: Dict[str, np.ndarray]) -> Dict:
    """upstream body_pose_model.pth -> NHWC param tree (keys match:
    model0.conv1_1.weight etc.)."""
    out = {}
    for k, v in sd.items():
        if k.endswith(".weight"):
            name = k[: -len(".weight")]
            out.setdefault(name, {})["w"] = jnp.asarray(
                np.transpose(v, (2, 3, 1, 0))
            )
        elif k.endswith(".bias"):
            name = k[: -len(".bias")]
            out.setdefault(name, {})["b"] = jnp.asarray(v)
    return out


def body_apply(params: Dict, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """x: (N, H, W, 3) preprocessed floats -> (paf (N,h,w,38), heat (N,h,w,19))."""
    feats = _run_spec(params, "model0.", _BODY_TRUNK, x)
    paf = _run_spec(params, "model1_1.", _stage1_spec("L1", 38), feats)
    heat = _run_spec(params, "model1_2.", _stage1_spec("L2", 19), feats)
    for s in range(2, 7):
        inp = jnp.concatenate([paf, heat, feats], axis=-1)
        paf = _run_spec(params, f"model{s}_1.", _stageN_spec(s, "L1", 185, 38), inp)
        heat = _run_spec(params, f"model{s}_2.", _stageN_spec(s, "L2", 185, 19), inp)
    return paf, heat


# hand net: trunk deeper (to conv5_2), 22-channel heatmaps
_HAND_TRUNK = _BODY_TRUNK[:12] + [
    ("conv4_3", 512, 512, 3, 1, True), ("conv4_4", 512, 512, 3, 1, True),
    ("conv5_1", 512, 512, 3, 1, True), ("conv5_2", 512, 512, 3, 1, True),
    ("conv5_3_CPM", 512, 128, 3, 1, True),
]


def _hand_stage1():
    return [
        ("conv6_1_CPM", 128, 512, 1, 0, True),
        ("conv6_2_CPM", 512, 22, 1, 0, False),
    ]


def _hand_stageN(stage: int):
    return [
        (f"Mconv1_stage{stage}", 150, 128, 7, 3, True),
        (f"Mconv2_stage{stage}", 128, 128, 7, 3, True),
        (f"Mconv3_stage{stage}", 128, 128, 7, 3, True),
        (f"Mconv4_stage{stage}", 128, 128, 7, 3, True),
        (f"Mconv5_stage{stage}", 128, 128, 7, 3, True),
        (f"Mconv6_stage{stage}", 128, 128, 1, 0, True),
        (f"Mconv7_stage{stage}", 128, 22, 1, 0, False),
    ]


def init_hand(key) -> Dict:
    ks = iter(jax.random.split(key, 16))
    params = _init_spec(next(ks), _HAND_TRUNK, "model1_0.")
    params.update(_init_spec(next(ks), _hand_stage1(), "model1_1."))
    for s in range(2, 7):
        params.update(_init_spec(next(ks), _hand_stageN(s), f"model{s}."))
    return params


convert_hand = convert_body  # same generic name->conv mapping


def hand_apply(params: Dict, x: jax.Array) -> jax.Array:
    feats = _run_spec(params, "model1_0.", _HAND_TRUNK, x)
    heat = _run_spec(params, "model1_1.", _hand_stage1(), feats)
    for s in range(2, 7):
        inp = jnp.concatenate([heat, feats], axis=-1)
        heat = _run_spec(params, f"model{s}.", _hand_stageN(s), inp)
    return heat


# ------------------------------------------------------------ decode (numpy)

# COCO-18 limb pairs and their PAF channel pairs (public CMU convention)
LIMB_PAIRS = [
    (1, 2), (1, 5), (2, 3), (3, 4), (5, 6), (6, 7), (1, 8), (8, 9), (9, 10),
    (1, 11), (11, 12), (12, 13), (1, 0), (0, 14), (14, 16), (0, 15), (15, 17),
    (2, 16), (5, 17),
]
PAF_CHANNELS = [
    (12, 13), (20, 21), (14, 15), (16, 17), (22, 23), (24, 25), (0, 1),
    (2, 3), (4, 5), (6, 7), (8, 9), (10, 11), (28, 29), (30, 31), (34, 35),
    (32, 33), (36, 37), (18, 19), (26, 27),
]


def _cv2_cubic_weights(src: int, dst: int) -> np.ndarray:
    """(dst, src) matrix W with W @ v == cv2.resize(v, INTER_CUBIC) along
    one axis for float input: half-pixel centers, Keys kernel A=-0.75
    (cv2's bicubic), replicate-clamped borders. Linear, so chained resizes
    compose by matrix product — the device upsample path uses this to
    reproduce the reference's two-stage cv2 chain exactly (~1e-5)."""
    scale = src / dst
    A = -0.75
    W = np.zeros((dst, src), np.float32)
    for i in range(dst):
        sx = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(sx))
        f = sx - x0
        for t in (-1, 0, 1, 2):
            d = abs(f - t)
            if d <= 1.0:
                w = ((A + 2.0) * d - (A + 3.0)) * d * d + 1.0
            elif d < 2.0:
                w = (((d - 5.0) * d + 8.0) * d - 4.0) * A
            else:
                w = 0.0
            W[i, min(max(x0 + t, 0), src - 1)] += w
    return W


def _upsample_matrices(small_h: int, small_w: int, padded_h: int,
                       padded_w: int, scaled_h: int, scaled_w: int,
                       h: int, w: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-axis matrices reproducing body.py's upsample chain: net output
    -> cv2 cubic to the padded size -> crop to the scaled size -> cv2
    cubic to the image size. All three stages are linear maps, so the
    composition is one (h, small_h) x (w, small_w) matrix pair."""
    wy = _cv2_cubic_weights(scaled_h, h) @ \
        _cv2_cubic_weights(small_h, padded_h)[:scaled_h]
    wx = _cv2_cubic_weights(scaled_w, w) @ \
        _cv2_cubic_weights(small_w, padded_w)[:scaled_w]
    return wy, wx


def _gaussian_matrix(n: int) -> np.ndarray:
    """(n, n) matrix applying the sigma=3 25-tap gaussian with cv2
    BORDER_REFLECT semantics along one axis — the linear form of
    `_gaussian_sigma3`, composable with the cubic upsample matrices so the
    device decode smooths for free inside the same matmul pair."""
    k = cv2.getGaussianKernel(25, 3).astype(np.float32)[:, 0]
    G = np.zeros((n, n), np.float32)
    for i in range(n):
        for t in range(-12, 13):
            j = i + t
            while j < 0 or j >= n:  # repeated reflection for n < radius
                j = -j - 1 if j < 0 else 2 * n - j - 1
            G[i, j] += k[t + 12]
    return G


class _VirtualMap:
    """Lazily evaluates the full-res upsampled map `wy @ small @ wx.T`
    at individual (y, x, c) points — exactly the values the materialized
    cv2 resize chain would hold, without building or fetching the
    (h, w, C) array. Supports the `m[ys, xs, c]` indexing `score_limbs`
    uses (ys/xs int arrays or scalars, c a channel index)."""

    def __init__(self, small: np.ndarray, wy: np.ndarray, wx: np.ndarray):
        self.small = np.asarray(small, np.float32)  # (sh, sw, C)
        self.wy = wy    # (h, sh)
        self.wx = wx    # (w, sw)

    def __getitem__(self, idx):
        ys, xs, c = idx
        ys = np.atleast_1d(np.asarray(ys, np.int64))
        xs = np.atleast_1d(np.asarray(xs, np.int64))
        m = self.small[:, :, c]                       # (sh, sw)
        # val_k = wy[ys[k]] @ m @ wx[xs[k]]
        return np.einsum("ks,sw,kw->k", self.wy[ys], m, self.wx[xs],
                         optimize=True)


def peaks_from_mask(mask: np.ndarray, heat_small: np.ndarray,
                    wy: np.ndarray, wx: np.ndarray) -> List[List[Tuple]]:
    """find_peaks from a device-computed peak mask (h, w, 18) plus the
    net-resolution heatmaps: peak coords come from the mask, peak scores
    from the virtual raw upsampled map at those coords (identical values
    to indexing the materialized full-res map)."""
    all_peaks: List[List[Tuple]] = []
    peak_id = 0
    for part in range(18):
        ys, xs = np.nonzero(mask[:, :, part])
        if len(ys):
            vm = _VirtualMap(heat_small, wy, wx)
            scores = vm[ys, xs, part]
        peaks = []
        for k, (x, y) in enumerate(zip(xs, ys)):
            peaks.append((int(x), int(y), float(scores[k]), peak_id))
            peak_id += 1
        all_peaks.append(peaks)
    return all_peaks


def _gaussian_sigma3(stack: np.ndarray) -> np.ndarray:
    """sigma=3 gaussian over the leading two axes of (h, w, c) f32.

    Numerically identical to scipy.ndimage.gaussian_filter(sigma=3) per
    channel (reflect border, truncate=4 -> radius 12 -> 25-tap kernel;
    verified max |diff| 2.4e-7 on random 512^2 maps) but ~7x faster on one
    host core — the decode used to spend ~200 ms/frame here at 512^2.
    """
    k = cv2.getGaussianKernel(25, 3).astype(np.float32)
    return cv2.sepFilter2D(stack, -1, k, k, borderType=cv2.BORDER_REFLECT)


def find_peaks(heatmap: np.ndarray, thresh: float = 0.1) -> List[List[Tuple]]:
    """Per-part peak lists [(x, y, score, id), ...] from (h, w, 19) maps."""
    m = _gaussian_sigma3(np.ascontiguousarray(heatmap[:, :, :18], np.float32))
    # 4-neighbour local-max with zero padding at the borders, expressed as
    # sliced in-place ANDs (no shifted full-map temporaries). Border rows
    # compare against implicit 0, which `m > thresh` already subsumes for
    # the positive thresholds this decoder uses.
    is_peak = m > thresh
    is_peak[1:, :] &= m[1:, :] >= m[:-1, :]
    is_peak[:-1, :] &= m[:-1, :] >= m[1:, :]
    is_peak[:, 1:] &= m[:, 1:] >= m[:, :-1]
    is_peak[:, :-1] &= m[:, :-1] >= m[:, 1:]
    all_peaks = []
    peak_id = 0
    for part in range(18):
        ys, xs = np.nonzero(is_peak[:, :, part])
        peaks = []
        for x, y in zip(xs, ys):
            peaks.append((int(x), int(y), float(heatmap[y, x, part]), peak_id))
            peak_id += 1
        all_peaks.append(peaks)
    return all_peaks


def score_limbs(
    paf: np.ndarray,
    all_peaks: List[List[Tuple]],
    img_h: int,
    n_samples: int = 10,
    paf_thresh: float = 0.05,
) -> List[np.ndarray]:
    """Greedy limb matching via PAF line integrals. Returns per-limb arrays
    of (peak_id_a, peak_id_b, score, idx_a, idx_b)."""
    connections = []
    for limb_idx, (pa, pb) in enumerate(LIMB_PAIRS):
        ca, cb = PAF_CHANNELS[limb_idx]
        cand_a = all_peaks[pa]
        cand_b = all_peaks[pb]
        if not cand_a or not cand_b:
            connections.append(np.zeros((0, 5)))
            continue
        scored = []
        for i, a in enumerate(cand_a):
            for j, b in enumerate(cand_b):
                vec = np.asarray([b[0] - a[0], b[1] - a[1]], np.float64)
                norm = max(np.linalg.norm(vec), 1e-6)
                u = vec / norm
                xs = np.linspace(a[0], b[0], n_samples)
                ys = np.linspace(a[1], b[1], n_samples)
                px = paf[ys.round().astype(int), xs.round().astype(int), ca]
                py = paf[ys.round().astype(int), xs.round().astype(int), cb]
                align = px * u[0] + py * u[1]
                # distance prior: penalize limbs longer than half the image
                prior = min(0.5 * img_h / norm - 1.0, 0.0)
                score = float(align.mean() + prior)
                ok = (align > paf_thresh).sum() > 0.8 * n_samples and score > 0
                if ok:
                    scored.append((i, j, score))
        scored.sort(key=lambda t: -t[2])
        used_a, used_b = set(), set()
        conn = []
        for i, j, s in scored:
            if i in used_a or j in used_b:
                continue
            used_a.add(i)
            used_b.add(j)
            conn.append([cand_a[i][3], cand_b[j][3], s, i, j])
        connections.append(np.asarray(conn).reshape(-1, 5))
    return connections


def assemble_people(
    all_peaks: List[List[Tuple]],
    connections: List[np.ndarray],
) -> Tuple[np.ndarray, np.ndarray]:
    """Merge limbs into person `subset` rows (20 cols: 18 part peak-ids,
    total score, part count) + flat `candidate` (x, y, score, id) array."""
    candidate = np.asarray(
        [p for peaks in all_peaks for p in peaks], np.float64
    ).reshape(-1, 4)
    subset = np.empty((0, 20))
    for limb_idx, (pa, pb) in enumerate(LIMB_PAIRS):
        conn = connections[limb_idx]
        for row in conn:
            ida, idb, score = row[0], row[1], row[2]
            found = []
            for si, s in enumerate(subset):
                if s[pa] == ida or s[pb] == idb:
                    found.append(si)
            if len(found) == 1:
                s = subset[found[0]]
                if s[pb] != idb:
                    s[pb] = idb
                    s[19] += 1
                    s[18] += candidate[int(idb), 2] + score
                elif s[pa] != ida:
                    s[pa] = ida
                    s[19] += 1
                    s[18] += candidate[int(ida), 2] + score
            elif len(found) == 2:
                s1, s2 = subset[found[0]], subset[found[1]]
                overlap = ((s1[:18] >= 0) & (s2[:18] >= 0)).sum()
                if overlap == 0:  # disjoint people: merge
                    s1[:18] = np.where(s2[:18] >= 0, s2[:18], s1[:18])
                    s1[18:] += s2[18:]
                    s1[18] += score
                    subset = np.delete(subset, found[1], axis=0)
                else:
                    s1[pb] = idb
                    s1[19] += 1
                    s1[18] += candidate[int(idb), 2] + score
            elif limb_idx < 17:
                row20 = -1 * np.ones(20)
                row20[pa] = ida
                row20[pb] = idb
                row20[19] = 2
                row20[18] = candidate[int(ida), 2] + candidate[int(idb), 2] + score
                subset = np.vstack([subset, row20])
    # prune weak/small people
    keep = [
        i for i, s in enumerate(subset)
        if s[19] >= 4 and s[18] / max(s[19], 1) >= 0.4
    ]
    return candidate, subset[keep]


# -------------------------------------------------------------- hand decode

# hand skeleton edges (public CMU 21-keypoint convention)
HAND_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 4), (0, 5), (5, 6), (6, 7), (7, 8),
    (0, 9), (9, 10), (10, 11), (11, 12), (0, 13), (13, 14), (14, 15),
    (15, 16), (0, 17), (17, 18), (18, 19), (19, 20),
]


def hand_detect(
    candidate: np.ndarray, subset: np.ndarray, img_h: int, img_w: int
) -> List[Tuple[int, int, int, bool]]:
    """Derive square hand boxes from body keypoints (the openpose
    handDetector.cpp recipe, mirrored by annotator/openpose/util.py
    handDetect:94-156): box center = wrist + 0.33*(wrist - elbow), box
    width = 1.5 * max(|wrist-elbow|, 0.9*|elbow-shoulder|), clipped to the
    image; boxes under 20 px are dropped. Returns (x, y, w, is_left) with
    (x, y) the top-left corner.

    Keypoint trios: right arm = parts (2, 3, 4), left arm = (5, 6, 7)."""
    ratio_wrist_elbow = 0.33
    boxes = []
    for person in subset.astype(int):
        arms = []
        if not np.any(person[[5, 6, 7]] == -1):  # left: shoulder/elbow/wrist
            arms.append((person[5], person[6], person[7], True))
        if not np.any(person[[2, 3, 4]] == -1):  # right
            arms.append((person[2], person[3], person[4], False))
        for sh, el, wr, is_left in arms:
            x1, y1 = candidate[sh][:2]
            x2, y2 = candidate[el][:2]
            x3, y3 = candidate[wr][:2]
            x = x3 + ratio_wrist_elbow * (x3 - x2)
            y = y3 + ratio_wrist_elbow * (y3 - y2)
            d_we = math.hypot(x3 - x2, y3 - y2)
            d_es = math.hypot(x2 - x1, y2 - y1)
            width = 1.5 * max(d_we, 0.9 * d_es)
            x -= width / 2
            y -= width / 2
            x, y = max(x, 0.0), max(y, 0.0)
            width = min(
                width,
                img_w - x if x + width > img_w else width,
                img_h - y if y + width > img_h else width,
            )
            if width >= 20:
                boxes.append((int(x), int(y), int(width), is_left))
    return boxes


def decode_hand_peaks(heatmap: np.ndarray, thresh: float = 0.05) -> np.ndarray:
    """(h, w, 22) averaged hand heatmaps -> (21, 2) int [x, y] peaks in crop
    coordinates; [0, 0] for parts below threshold. Mirrors hand.py:58-73:
    smooth, keep the connected component with the largest total activation,
    take its argmax."""
    from scipy.ndimage import label as cc_label

    all_smoothed = _gaussian_sigma3(
        np.ascontiguousarray(heatmap[:, :, :21], np.float32))
    peaks = np.zeros((21, 2), np.int64)
    eight = np.ones((3, 3), np.int32)  # 8-connectivity (skimage ndim default)
    for part in range(21):
        m = heatmap[:, :, part].copy()
        smoothed = all_smoothed[:, :, part]
        binary = smoothed > thresh
        if not binary.any():
            continue
        labels, n = cc_label(binary, structure=eight)
        sums = [m[labels == i].sum() for i in range(1, n + 1)]
        best = int(np.argmax(sums)) + 1
        m[labels != best] = 0
        y, x = np.unravel_index(np.argmax(m), m.shape)
        peaks[part] = (x, y)
    return peaks


# ------------------------------------------------------------------ drawing

_BODY_COLORS = [
    (255, 0, 0), (255, 85, 0), (255, 170, 0), (255, 255, 0), (170, 255, 0),
    (85, 255, 0), (0, 255, 0), (0, 255, 85), (0, 255, 170), (0, 255, 255),
    (0, 170, 255), (0, 85, 255), (0, 0, 255), (85, 0, 255), (170, 0, 255),
    (255, 0, 255), (255, 0, 170), (255, 0, 85),
]


def draw_bodypose(canvas: np.ndarray, candidate: np.ndarray, subset: np.ndarray
                  ) -> np.ndarray:
    """Skeleton rendering (annotator/openpose/util.py draw_bodypose)."""
    for limb_idx in range(17):
        pa, pb = LIMB_PAIRS[limb_idx]
        for s in subset:
            ia, ib = int(s[pa]), int(s[pb])
            if ia < 0 or ib < 0:
                continue
            xa, ya = candidate[ia, :2]
            xb, yb = candidate[ib, :2]
            mx, my = (xa + xb) / 2, (ya + yb) / 2
            length = math.hypot(xa - xb, ya - yb)
            angle = math.degrees(math.atan2(yb - ya, xb - xa))
            poly = cv2.ellipse2Poly(
                (int(mx), int(my)), (int(length / 2), 4), int(angle), 0, 360, 1
            )
            cv2.fillConvexPoly(canvas, poly, _BODY_COLORS[limb_idx % 18])
    canvas = (canvas * 0.6).astype(np.uint8)
    for part in range(18):
        for s in subset:
            idx = int(s[part])
            if idx < 0:
                continue
            x, y = candidate[idx, :2]
            cv2.circle(canvas, (int(x), int(y)), 4, _BODY_COLORS[part], thickness=-1)
    return canvas


def draw_handpose(canvas: np.ndarray, all_hand_peaks: Sequence[np.ndarray]
                  ) -> np.ndarray:
    """Hand skeleton rendering (util.py draw_handpose:74-90): each of the 20
    edges gets an HSV hue by edge index; every keypoint (including the [0,0]
    sentinels — a reference quirk kept for parity) gets a red dot."""
    import colorsys

    for peaks in all_hand_peaks:
        peaks = np.asarray(peaks)
        for ie, (a, b) in enumerate(HAND_EDGES):
            # skip if either endpoint is the [0, 0] "not found" sentinel
            if np.all(peaks[a] == 0) or np.all(peaks[b] == 0):
                continue
            rgb = colorsys.hsv_to_rgb(ie / len(HAND_EDGES), 1.0, 1.0)
            color = tuple(int(c * 255) for c in rgb)
            cv2.line(canvas, (int(peaks[a][0]), int(peaks[a][1])),
                     (int(peaks[b][0]), int(peaks[b][1])), color, thickness=2)
        for x, y in peaks:
            cv2.circle(canvas, (int(x), int(y)), 4, (0, 0, 255), thickness=-1)
    return canvas


# ----------------------------------------------------------------- detector


class OpenposeDetector:
    """Drop-in OpenposeDetector (annotator/openpose/__init__.py:21-50):
    uint8 HWC RGB image -> (pose canvas uint8, {candidate, subset})."""

    BOX_SIZE = 368
    STRIDE = 8
    PEAK_THRESH = 0.1  # find_peaks default (body.py threshold)

    # hand-net multi-scale search (hand.py:27): crop is square, so scaled
    # inputs are EXACTLY scale*368 px — four fixed compiled shapes, ever.
    HAND_SCALES = (0.5, 1.0, 1.5, 2.0)

    def __init__(
        self,
        body_params: Optional[Dict] = None,
        body_ckpt: Optional[str] = None,
        hand_params: Optional[Dict] = None,
        hand_ckpt: Optional[str] = None,
    ):
        from stablediffusioneo_tpu.checkpoint.torch_reader import (
            load_torch_state_dict,
        )

        if body_params is None:
            if body_ckpt is not None:
                body_params = convert_body(load_torch_state_dict(body_ckpt))
            else:
                body_params = init_body(jax.random.PRNGKey(0))
        from stablediffusioneo_tpu.annotators._dtype import cast_params

        # bf16 on TPU / f32 elsewhere (annotators/_dtype.py); paf/heat
        # come back f32 — the host peak/limb decode stays exact
        self.body_params = cast_params(body_params)
        if hand_params is None:
            if hand_ckpt is not None:
                hand_params = convert_hand(load_torch_state_dict(hand_ckpt))
            else:
                hand_params = init_hand(jax.random.PRNGKey(1))
        self.hand_params = cast_params(hand_params)
        dt = jax.tree.leaves(self.body_params)[0].dtype
        # uint8 upload; the CMU /256-0.5 normalize runs in-graph (4x
        # cheaper transfer to a network-attached TPU than f32 pixels).
        # paf+heat come back as ONE concatenated array: the device->host
        # fetch is RTT-bound on a tunneled chip (~45 ms/transfer for a
        # 120 KB result), so two fetches cost double one.
        def _fused_body(p, u8):
            paf, heat = body_apply(p, u8.astype(dt) / 256.0 - 0.5)
            return jnp.concatenate([paf, heat], axis=-1).astype(jnp.float32)

        self._apply = jax.jit(_fused_body)
        self._hand_apply = jax.jit(
            lambda p, u8: hand_apply(
                p, u8.astype(dt) / 256.0 - 0.5).astype(jnp.float32))

        # single-scale fast decode: net + heat upsample/gaussian (as one
        # composed matmul pair) + the 4-neighbour peak mask, ALL in-graph.
        # Fetch = raw net maps (23^2 x 57, 120 KB) + the u8 mask — the
        # reference's host chain (two 57-channel cv2 cubic resizes + a
        # sigma-3 gaussian, ~285 ms/frame on one core, body.py:24-219)
        # never materializes: limb scores and peak scores sample the
        # virtual upsampled maps exactly via the same linear maps.
        def _fused_decode(p, u8, wyg, wxg):
            paf, heat = body_apply(p, u8.astype(dt) / 256.0 - 0.5)
            both = jnp.concatenate(
                [paf, heat], axis=-1).astype(jnp.float32)[0]   # (sh, sw, 57)
            hm = both[:, :, 38:56]                             # 18 parts
            m = jnp.einsum("hs,swc->hwc", wyg, hm)
            m = jnp.einsum("wt,htc->hwc", wxg, m)              # (h, w, 18)
            pk = m > self.PEAK_THRESH
            ones = jnp.ones_like(pk[:1])
            pk &= jnp.concatenate([ones, m[1:] >= m[:-1]], axis=0)
            pk &= jnp.concatenate([m[:-1] >= m[1:], ones], axis=0)
            ones = jnp.ones_like(pk[:, :1])
            pk &= jnp.concatenate([ones, m[:, 1:] >= m[:, :-1]], axis=1)
            pk &= jnp.concatenate([m[:, :-1] >= m[:, 1:], ones], axis=1)
            # ONE u8 blob fetch: the (h, w, 18) u8 mask alone is ~4.7 MB
            # at 512^2 — ~170 ms on the ~28 MB/s tunnel (the r5 regression
            # the first device-decode cut measured). Bit-pack the mask
            # (8x) and ride the f32 net maps' bytes in the same array so
            # the RTT-bound fetch happens once (same trick as the r3
            # bit-packed hint upload).
            flat = pk.reshape(-1)
            pad = (-flat.shape[0]) % 8
            flat = jnp.concatenate(
                [flat, jnp.zeros((pad,), flat.dtype)]) if pad else flat
            bits = flat.reshape(-1, 8).astype(jnp.uint8)
            weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
            packed = (bits * weights).sum(axis=1, dtype=jnp.uint8)
            map_bytes = jax.lax.bitcast_convert_type(
                both, jnp.uint8).reshape(-1)
            return jnp.concatenate([map_bytes, packed])

        self._decode = jax.jit(_fused_decode)
        self._mat_cache: Dict[Tuple, Tuple] = {}

    def _infer_maps(self, img: np.ndarray, scales=(0.5,)) -> Tuple[np.ndarray, np.ndarray]:
        h, w = img.shape[:2]
        heat_avg = np.zeros((h, w, 19), np.float32)
        paf_avg = np.zeros((h, w, 38), np.float32)
        for scale in scales:
            s = scale * self.BOX_SIZE / h
            scaled = cv2.resize(img, (0, 0), fx=s, fy=s, interpolation=cv2.INTER_CUBIC)
            pad_h = (self.STRIDE - scaled.shape[0] % self.STRIDE) % self.STRIDE
            pad_w = (self.STRIDE - scaled.shape[1] % self.STRIDE) % self.STRIDE
            padded = np.pad(scaled, ((0, pad_h), (0, pad_w), (0, 0)), constant_values=128)
            x = np.ascontiguousarray(padded[None])
            both = np.asarray(self._apply(self.body_params, jnp.asarray(x)),
                              np.float32)[0]
            paf, heat = both[:, :, :38], both[:, :, 38:]
            up = lambda m: cv2.resize(
                m, (w, h), interpolation=cv2.INTER_CUBIC
            )
            heat_full = cv2.resize(
                heat, (padded.shape[1], padded.shape[0]), interpolation=cv2.INTER_CUBIC
            )[: scaled.shape[0], : scaled.shape[1]]
            paf_full = cv2.resize(
                paf, (padded.shape[1], padded.shape[0]), interpolation=cv2.INTER_CUBIC
            )[: scaled.shape[0], : scaled.shape[1]]
            heat_avg += up(heat_full) / len(scales)
            paf_avg += up(paf_full) / len(scales)
        return paf_avg, heat_avg

    def _decode_matrices(self, h: int, w: int, scale: float):
        """Cached per-(h, w, scale): raw upsample matrices (host virtual
        sampling) + gaussian-composed device copies (peak mask)."""
        key = (h, w, scale)
        if key not in self._mat_cache:
            s = scale * self.BOX_SIZE / h
            sh, sw = int(round(h * s)), int(round(w * s))
            ph = sh + (self.STRIDE - sh % self.STRIDE) % self.STRIDE
            pw = sw + (self.STRIDE - sw % self.STRIDE) % self.STRIDE
            wy, wx = _upsample_matrices(ph // self.STRIDE, pw // self.STRIDE,
                                        ph, pw, sh, sw, h, w)
            wyg = jnp.asarray(_gaussian_matrix(h) @ wy)
            wxg = jnp.asarray(_gaussian_matrix(w) @ wx)
            self._mat_cache[key] = (wy, wx, wyg, wxg, (sh, sw), (ph, pw))
        return self._mat_cache[key]

    def _infer_fast(self, img: np.ndarray, scale: float = 0.5):
        """Single-scale device decode: returns (raw net maps (sh,sw,57),
        peak mask (h,w,18) u8, wy, wx) — see _fused_decode."""
        h, w = img.shape[:2]
        wy, wx, wyg, wxg, (sh, sw), (ph, pw) = self._decode_matrices(
            h, w, scale)
        scaled = cv2.resize(img, (sw, sh), interpolation=cv2.INTER_CUBIC)
        padded = np.pad(scaled, ((0, ph - sh), (0, pw - sw), (0, 0)),
                        constant_values=128)
        blob = np.asarray(self._decode(self.body_params,
                                       jnp.asarray(padded[None]), wyg, wxg))
        # unpack the single u8 blob: f32 net-map bytes, then the
        # bit-packed (h, w, 18) peak mask (see _fused_decode)
        mh, mw = ph // self.STRIDE, pw // self.STRIDE
        nb = mh * mw * 57 * 4
        both = np.frombuffer(blob[:nb].tobytes(),
                             np.float32).reshape(mh, mw, 57)
        mask = np.unpackbits(blob[nb:])[:h * w * 18].reshape(h, w, 18)
        return both, mask, wy, wx

    def _infer_hand_peaks(self, crop: np.ndarray, scales=None) -> np.ndarray:
        """Run the hand net multi-scale on one square crop and decode 21
        peaks (hand.py:25-74). Each scale resizes the crop to exactly
        scale*368 px (square), a multiple of the stride — no padding, and a
        fixed compile footprint of len(scales) shapes."""
        scales = self.HAND_SCALES if scales is None else scales
        w = crop.shape[0]
        heat_avg = np.zeros((w, w, 22), np.float32)
        # dispatch every scale before fetching any: jax's async dispatch
        # overlaps the device work, so the serialized RTT-bound fetches
        # don't also serialize the compute
        pending = []
        for scale in scales:
            size = int(round(scale * self.BOX_SIZE))
            size -= size % self.STRIDE  # keep multiples of the net stride
            scaled = cv2.resize(crop, (size, size), interpolation=cv2.INTER_CUBIC)
            x = np.ascontiguousarray(scaled[None])
            pending.append(
                (size, self._hand_apply(self.hand_params, jnp.asarray(x))))
        for size, dev_heat in pending:
            heat = np.asarray(dev_heat, np.float32)[0]
            heat = cv2.resize(heat, (size, size), interpolation=cv2.INTER_CUBIC)
            heat_avg += cv2.resize(heat, (w, w), interpolation=cv2.INTER_CUBIC
                                   ) / len(scales)
        return decode_hand_peaks(heat_avg)

    def __call__(self, img: np.ndarray, hand: bool = False,
                 hand_scales=None):
        # the CMU nets are BGR-trained; the reference flips at entry
        # (annotator/openpose/__init__.py:35) and draws on the flipped frame
        img = img[:, :, ::-1].copy()
        # device decode (net + upsample + gaussian + peak mask in-graph);
        # peak/limb scores sample the virtual full-res maps — identical
        # values to the materialized chain (`_infer_maps`, kept for
        # multi-scale use) without the ~285 ms/frame of host resizes
        small, mask, wy, wx = self._infer_fast(img)
        peaks = peaks_from_mask(mask, small[:, :, 38:], wy, wx)
        paf_v = _VirtualMap(small[:, :, :38], wy, wx)
        connections = score_limbs(paf_v, peaks, img.shape[0])
        candidate, subset = assemble_people(peaks, connections)
        canvas = np.zeros_like(img)
        canvas = draw_bodypose(canvas, candidate, subset)
        if hand:
            boxes = hand_detect(candidate, subset, img.shape[0], img.shape[1])
            all_hand_peaks = []
            for x, y, w, _is_left in boxes:
                pk = self._infer_hand_peaks(img[y:y + w, x:x + w, :],
                                            scales=hand_scales)
                # offset into image coords; [0,0] sentinels stay put
                pk[:, 0] = np.where(pk[:, 0] == 0, 0, pk[:, 0] + x)
                pk[:, 1] = np.where(pk[:, 1] == 0, 0, pk[:, 1] + y)
                all_hand_peaks.append(pk)
            canvas = draw_handpose(canvas, all_hand_peaks)
        return canvas, dict(candidate=candidate.tolist(), subset=subset.tolist())
