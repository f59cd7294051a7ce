"""Cen 2018 / 2019 detectors (reference Utils.cpp cen2018features /
cen2019features; scan-type zoo ScanType.h:148-165)."""
import jax.numpy as jnp
import numpy as np

from tbv_slam_public_tpu.core.config import RadarConfig
from tbv_slam_public_tpu.ops import cen


def synthetic_image(a=64, r=256, peaks=((10, 80), (20, 150), (40, 60)),
                    noise=5.0, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.normal(20.0, noise, size=(a, r)).astype(np.float32)
    img = np.clip(img, 0, None)
    for (ai, ri) in peaks:
        for da in range(-1, 2):
            img[(ai + da) % a, ri - 2: ri + 3] += 150.0 * np.exp(
                -0.5 * (np.arange(ri - 2, ri + 3) - ri) ** 2 / 1.5)
    return img


def cen2018_reference(img, zq, sigma_gauss, min_range):
    """Direct NumPy transcription of the published algorithm (golden)."""
    a_n, r_n = img.shape
    q = img - img.mean(axis=1, keepdims=True)
    fsize = sigma_gauss * 3
    mu = fsize // 2
    filt = np.exp(-0.5 * (np.arange(fsize) - mu) ** 2 / sigma_gauss ** 2)
    filt /= filt.sum()
    p = np.empty_like(q)
    pad = np.pad(q, ((0, 0), (mu, fsize - 1 - mu)), mode="reflect")
    for i in range(a_n):
        p[i] = np.convolve(pad[i], filt, mode="valid")
    out = []
    for i in range(a_n):
        neg = q[i][q[i] < 0]
        sig = np.sqrt((2 * neg ** 2).sum() / len(neg)) if len(neg) else 0.034
        thres = zq * sig
        run = []
        for j in range(min_range, r_n):
            nqp = np.exp(-0.5 * ((q[i, j] - p[i, j]) / sig) ** 2)
            npp = np.exp(-0.5 * (p[i, j] / sig) ** 2)
            y = q[i, j] * (1 - nqp) + p[i, j] * (nqp - npp)
            if y > thres:
                run.append(j)
            elif run:
                out.append((i, run[len(run) // 2]))
                run = []
        if run:
            out.append((i, run[len(run) // 2]))
    return set(out)


def test_cen2018_matches_reference_formula():
    img = synthetic_image()
    cfg = RadarConfig(num_azimuths=64, num_range_bins=256, range_res=0.4,
                      min_distance=4.0, k_strongest=8)
    min_range = int(np.ceil(cfg.min_distance / cfg.range_res))
    golden = cen2018_reference(img, 3.0, 17, min_range)
    _, _, _, detect = cen._cen2018_impl(
        jnp.asarray(img), zq=3.0, sigma_gauss=17, min_range=min_range,
        capacity=512)
    ours = set(map(tuple, np.argwhere(np.asarray(detect))))
    assert ours == golden


def test_cen2018_detects_planted_peaks():
    img = synthetic_image()
    cfg = RadarConfig(num_azimuths=64, num_range_bins=256, range_res=0.4,
                      min_distance=4.0, k_strongest=8)
    cloud = cen.cen2018_filter(jnp.asarray(img), cfg)
    pts = np.asarray(cloud.xy)[np.asarray(cloud.mask)]
    assert pts.shape[0] >= 3
    for (ai, ri) in ((10, 80), (20, 150), (40, 60)):
        th = 2 * np.pi * (ai + 1) / 64
        expect = 0.4 * (ri + 0.5) * np.array([np.cos(th), np.sin(th)])
        d = np.linalg.norm(pts - expect, axis=1).min()
        assert d < 2.0, (ai, ri, d)


def test_cen2019_detects_planted_peaks():
    img = synthetic_image()
    cfg = RadarConfig(num_azimuths=64, num_range_bins=256, range_res=0.4,
                      min_distance=4.0, k_strongest=8)
    cloud = cen.cen2019_filter(img, cfg, max_points=200)
    pts = np.asarray(cloud.xy)[np.asarray(cloud.mask)]
    assert pts.shape[0] >= 3
    for (ai, ri) in ((10, 80), (20, 150), (40, 60)):
        th = 2 * np.pi * (ai + 1) / 64
        expect = 0.4 * (ri + 0.5) * np.array([np.cos(th), np.sin(th)])
        d = np.linalg.norm(pts - expect, axis=1).min()
        assert d < 2.0, (ai, ri, d)
