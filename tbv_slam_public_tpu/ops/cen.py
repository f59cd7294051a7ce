"""Cen 2018 / Cen 2019 radar landmark detectors.

Re-design of the alternative detectors bundled with the reference's
alignment-evaluation scan-type zoo (reference
coral_alignment_quality/src/alignment_checker/Utils.cpp: cen2018features /
cen2019features; used by the Cen2018Radar/Cen2019Radar PoseScan types,
ScanType.h:148-165).  Neither is on the TBV runtime path — they exist for
the offline scan evaluator — so only Cen2018 (whose math is pure row-wise
filtering) gets a jitted tensor form; Cen2019's greedy sequential region
marking is kept as a faithful host (NumPy) implementation.

Cen 2018 ("Precise ego-motion estimation with millimeter-wave radar under
diverse and challenging conditions"), per azimuth row:
1. subtract the row mean (bias estimate),
2. 1-D Gaussian smooth (sigma_gauss taps * 3 window, reflect padding),
3. noise sigma from the negative samples: sqrt(mean(2 q^2 | q < 0)),
4. score y = q (1 - N(q|p,sigma)) + p (N(q|p,sigma) - N(p|0,sigma)),
5. threshold y > zq * sigma; each CONTIGUOUS run of above-threshold bins
   yields one detection at its middle bin (Utils.cpp run-middle extraction).

Cen 2019 ("Radar-only ego-motion estimation in difficult settings via graph
matching"): Prewitt gradient scaling, mean-subtracted signal, greedy
descending-intensity region marking bounded by sign changes, detections at
the per-run score argmax where an adjacent azimuth is also marked.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import RadarConfig
from ..core.types import PointCloud
from .radar import polar_to_xy


def _row_gaussian_smooth(q: jnp.ndarray, sigma_gauss: int) -> jnp.ndarray:
    """1-D Gaussian filter along range with reflect-101 padding
    (cv::filter2D BORDER_REFLECT101, Utils.cpp cen2018 step 2)."""
    fsize = sigma_gauss * 3
    mu = fsize // 2
    i = jnp.arange(fsize, dtype=jnp.float32)
    filt = jnp.exp(-0.5 * (i - mu) ** 2 / float(sigma_gauss * sigma_gauss))
    filt = filt / jnp.sum(filt)
    pad_l, pad_r = mu, fsize - 1 - mu
    qp = jnp.pad(q, ((0, 0), (pad_l, pad_r)), mode="reflect")
    # depthwise 1-D conv as a single 2-D conv with a [1, fsize] kernel
    out = jax.lax.conv_general_dilated(
        qp[:, None, None, :], filt[None, None, None, :],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out[:, 0, 0, :]


@partial(jax.jit, static_argnames=("zq", "sigma_gauss", "min_range",
                                   "capacity"))
def _cen2018_impl(image: jnp.ndarray, *, zq: float, sigma_gauss: int,
                  min_range: int, capacity: int):
    img = image.astype(jnp.float32)
    a, r = img.shape
    q = img - jnp.mean(img, axis=1, keepdims=True)
    p = _row_gaussian_smooth(q, sigma_gauss)

    neg = q < 0
    n_neg = jnp.sum(neg, axis=1)
    sig = jnp.sqrt(jnp.sum(jnp.where(neg, 2.0 * q * q, 0.0), axis=1)
                   / jnp.maximum(n_neg, 1))
    sig = jnp.where(n_neg > 0, sig, 0.034)[:, None]  # [A, 1]

    nqp = jnp.exp(-0.5 * ((q - p) / sig) ** 2)
    npp = jnp.exp(-0.5 * (p / sig) ** 2)
    y = q * (1.0 - nqp) + p * (nqp - npp)

    idx = jnp.arange(r)
    above = (y > zq * sig) & (idx[None, :] >= min_range)

    # run-middle extraction: a run start..end of above-threshold bins yields
    # one detection at start + (len/2) (peak_points[size/2], Utils.cpp).
    prev = jnp.pad(above[:, :-1], ((0, 0), (1, 0)))
    nxt = jnp.pad(above[:, 1:], ((0, 0), (0, 1)))
    is_start = above & ~prev
    is_end = above & ~nxt
    start_idx = jnp.where(is_start, idx[None, :], -1)
    run_start = jax.lax.associative_scan(jnp.maximum, start_idx, axis=1)
    end_idx = jnp.where(is_end, idx[None, :], r + 1)
    run_end = jax.lax.associative_scan(
        jnp.minimum, end_idx, axis=1, reverse=True)
    run_len = run_end - run_start + 1
    mid = run_start + run_len // 2
    detect = above & (idx[None, :] == mid)

    # fixed-capacity selection by score (strongest detections first)
    flat_score = jnp.where(detect, y, -jnp.inf).reshape(-1)
    top, flat_pick = jax.lax.top_k(flat_score, capacity)
    ai = flat_pick // r
    ri = flat_pick % r
    mask = jnp.isfinite(top)
    xy = polar_to_xy(ai, ri, a, 1.0)  # unit range res; scaled by caller
    intensity = img[ai, ri]
    return xy, intensity, mask, detect


def cen2018_filter(image: jnp.ndarray, cfg: RadarConfig, zq: float = 3.0,
                   sigma_gauss: int = 17, capacity: int | None = None):
    """Cen 2018 detector -> fixed-capacity point cloud
    (Cen2018Radar, ScanType.cpp:68-88: zq=3.0, sigma_gauss=17,
    min_range = sensor_min_distance in bins)."""
    min_range = int(np.ceil(cfg.min_distance / cfg.range_res))
    cap = capacity or cfg.num_azimuths * cfg.k_strongest
    xy, intensity, mask, _ = _cen2018_impl(
        image, zq=zq, sigma_gauss=sigma_gauss, min_range=min_range,
        capacity=cap)
    return PointCloud(xy=xy * cfg.range_res, intensity=intensity, mask=mask)


def cen2019_features(image: np.ndarray, max_points: int = 1000,
                     min_range: int = 0) -> np.ndarray:
    """Cen 2019 detector (host implementation; returns [N, 2] int array of
    (azimuth, range-bin) detections).

    Greedy region marking in descending score order (cen2019features,
    Utils.cpp): the loop's data-dependence (regions exclude previously
    marked cells) makes it inherently sequential — acceptable here because
    this detector only feeds the offline scan evaluator.
    """
    img = np.asarray(image, np.float32)
    a_n, r_n = img.shape
    # Prewitt gradient along range, reflect-101 border, normalized
    gl = np.empty_like(img)
    gl[:, 1:-1] = img[:, 2:] - img[:, :-2]
    gl[:, 0] = img[:, 1] - img[:, 1]
    gl[:, -1] = img[:, -2] - img[:, -2]
    g = np.abs(gl)
    g /= max(g.max(), 1e-12)
    s = img - img.mean()
    h = s * (1.0 - g)
    mean_h = h.mean()

    cand = np.argwhere(h > mean_h)
    order = np.argsort(-h[cand[:, 0], cand[:, 1]])
    cand = cand[order]

    marked = np.zeros_like(img, bool)
    false_count = img.size
    l = 0
    for (ai, ri) in cand:
        if l >= max_points or false_count <= 0:
            break
        if marked[ai, ri]:
            continue
        # expand while the mean-subtracted signal stays negative
        rlow = ri
        for i in range(ri - 1, -1, -1):
            if s[ai, i] < 0:
                rlow = i
            else:
                break
        rhigh = ri
        for i in range(ri + 1, r_n):
            if s[ai, i] < 0:
                rhigh = i
            else:
                break
        already = marked[ai, rlow:rhigh + 1].any()
        newly = ~marked[ai, rlow:rhigh + 1]
        marked[ai, rlow:rhigh + 1] = True
        false_count -= int(newly.sum())
        if not already:
            l += 1

    out = []
    for ai in range(a_n):
        row = marked[ai]
        below = marked[(ai - 1) % a_n]
        above = marked[(ai + 1) % a_n]
        j = min_range
        while j < r_n:
            if row[j]:
                start = j
                while j < r_n and row[j]:
                    j += 1
                end = j - 1
                if below[start:end + 1].any() or above[start:end + 1].any():
                    out.append((ai, start + int(np.argmax(h[ai, start:end + 1]))))
            else:
                j += 1
    return np.asarray(out, np.int32).reshape(-1, 2)


def cen2019_filter(image: np.ndarray, cfg: RadarConfig,
                   max_points: int = 1000,
                   capacity: int | None = None) -> PointCloud:
    """Cen 2019 detections as a fixed-capacity point cloud."""
    min_range = int(np.ceil(cfg.min_distance / cfg.range_res))
    det = cen2019_features(image, max_points=max_points, min_range=min_range)
    cap = capacity or cfg.num_azimuths * cfg.k_strongest
    n = min(det.shape[0], cap)
    xy = np.zeros((cap, 2), np.float32)
    intensity = np.zeros((cap,), np.float32)
    mask = np.zeros((cap,), bool)
    if n:
        pts = np.asarray(polar_to_xy(
            jnp.asarray(det[:n, 0]), jnp.asarray(det[:n, 1]),
            cfg.num_azimuths, cfg.range_res))
        xy[:n] = pts
        img = np.asarray(image, np.float32)
        intensity[:n] = img[det[:n, 0], det[:n, 1]]
        mask[:n] = True
    return PointCloud(xy=jnp.asarray(xy), intensity=jnp.asarray(intensity),
                      mask=jnp.asarray(mask))
