"""ScanContext descriptor/distance/retrieval tests (reference
Scancontext.cpp, RadarScancontext.cpp semantics)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tbv_slam_public_tpu.core.config import ScanContextConfig
from tbv_slam_public_tpu.core.types import PointCloud
from tbv_slam_public_tpu.ops import scancontext as sc

CFG = ScanContextConfig(num_ring=8, num_sector=24, max_radius=40.0,
                        desc_divider=1.0)


def cloud_from(xy, intensity=None, cap=256):
    xy = np.asarray(xy, np.float32)
    n = len(xy)
    if intensity is None:
        intensity = np.full(n, 100.0, np.float32)
    return PointCloud(
        xy=jnp.asarray(np.pad(xy, ((0, cap - n), (0, 0)))),
        intensity=jnp.asarray(np.pad(np.asarray(intensity, np.float32),
                                     (0, cap - n))),
        mask=jnp.asarray(np.arange(cap) < n),
    )


def test_descriptor_binning_golden():
    """Bin assignment follows ceil conventions (RadarScancontext.cpp:88-89)."""
    # point at r=4.5 (ring ceil(4.5/40*8)=1 -> idx 0), angle 20 deg
    # (sector ceil(20/360*24)=2 -> idx 1); mid-bin to avoid boundary fp issues
    ang = np.radians(20.0)
    xy = [[4.5 * np.cos(ang), 4.5 * np.sin(ang)],
          [4.5 * np.cos(ang) + 0.01, 4.5 * np.sin(ang)]]
    desc = sc.make_descriptor(cloud_from(xy, [70.0, 50.0]), CFG)
    desc = np.asarray(desc)
    assert desc[0, 1] == pytest.approx(120.0)  # sum of intensities
    assert np.sum(desc != 0) == 1


def test_descriptor_out_of_range_dropped():
    desc = sc.make_descriptor(cloud_from([[100.0, 0.0]]), CFG)
    assert np.all(np.asarray(desc) == 0)


def test_descriptor_max_mode():
    cfg = ScanContextConfig(num_ring=8, num_sector=24, max_radius=40.0,
                            desc_divider=1.0, desc_function="max")
    ang = np.radians(20.0)
    xy = [[4.5 * np.cos(ang), 4.5 * np.sin(ang)],
          [4.5 * np.cos(ang) + 0.01, 4.5 * np.sin(ang)]]
    desc = sc.make_descriptor(cloud_from(xy, [70.0, 50.0]), cfg)
    assert np.asarray(desc)[0, 1] == pytest.approx(70.0)


def test_keys():
    rng = np.random.default_rng(0)
    desc = jnp.asarray(rng.uniform(size=(8, 24)), jnp.float32)
    np.testing.assert_allclose(np.asarray(sc.ring_key(desc)),
                               np.asarray(desc).mean(1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sc.sector_key(desc)),
                               np.asarray(desc).mean(0), rtol=1e-5)


def test_distance_zero_for_identical():
    rng = np.random.default_rng(1)
    desc = jnp.asarray(rng.uniform(0.1, 1.0, size=(8, 24)), jnp.float32)
    d, shift = sc.sc_distance(desc, desc, search_ratio=0.1)
    assert float(d) < 1e-5
    assert int(shift) == 0


def test_distance_recovers_rotation():
    """A rotated scene = circularly shifted descriptor; distance ~0 at the
    right shift."""
    rng = np.random.default_rng(2)
    desc = jnp.asarray(rng.uniform(0.1, 1.0, size=(8, 24)), jnp.float32)
    for true_shift in [1, 2, 5, 19, 23]:
        shifted = sc.all_column_shifts(desc)[true_shift]
        d, got = sc.sc_distance(desc, shifted, search_ratio=1.0)
        # query vs shifted: distance minimized at the inverse shift
        assert float(d) < 1e-5, true_shift
        assert int(got) == (24 - true_shift) % 24


def test_distance_search_window_masks():
    """With a small search ratio, far-away shifts are not considered."""
    rng = np.random.default_rng(3)
    desc = jnp.asarray(rng.uniform(0.1, 1.0, size=(8, 24)), jnp.float32)
    shifted = sc.all_column_shifts(desc)[12]  # half-turn
    d_small, _ = sc.sc_distance(desc, shifted, search_ratio=0.1)
    d_full, _ = sc.sc_distance(desc, shifted, search_ratio=2.0)
    assert float(d_full) < 1e-5
    # the +-1 window around the (now correct, since vkey aligns) center may
    # still find it; evaluate window centered away by using a noisy copy
    assert float(d_small) <= float(d_full) + 1.0


def test_rotated_cloud_yaw_estimate():
    rng = np.random.default_rng(4)
    pts = rng.uniform(-30, 30, size=(150, 2))
    yaw = 2 * np.pi * 5 / 24  # exactly 5 sectors
    c, s = np.cos(yaw), np.sin(yaw)
    rot = np.array([[c, -s], [s, c]])
    cfg = ScanContextConfig(num_ring=8, num_sector=24, max_radius=40.0,
                            desc_divider=1.0)
    d1 = sc.make_descriptor(cloud_from(pts), cfg)
    d2 = sc.make_descriptor(cloud_from(pts @ rot.T), cfg)
    dist, shift = sc.sc_distance(d1, d2, search_ratio=1.0)
    assert float(dist) < 0.05
    est_yaw = float(sc.shift_to_yaw(shift, 24))
    # query-vs-rotated: shift * sector angle recovers the rotation (mod 2pi)
    assert min(abs(est_yaw - (2 * np.pi - yaw)), abs(est_yaw - yaw)) < 0.27


def test_odometry_similarity_near_zero_for_revisit():
    # poses going around a square back to start
    side = np.linspace(0, 50, 26)[:-1]
    path = np.concatenate([
        np.stack([side, np.zeros_like(side)], 1),
        np.stack([np.full_like(side, 50), side], 1),
        np.stack([50 - side, np.full_like(side, 50)], 1),
        np.stack([np.zeros_like(side), 50 - side], 1),
        np.array([[0.0, 0.0]]),
    ])
    n = len(path)
    cap = 128
    pos = jnp.asarray(np.pad(path, ((0, cap - n), (0, 0))), jnp.float32)
    mask = jnp.asarray(np.arange(cap) < n)
    sim = np.asarray(sc.odometry_similarity(pos, mask, sigma=0.05))
    # revisited start: est distance ~0 within the 5 m slack -> similarity ~0
    assert sim[0] < 0.01
    # mid-route pose at distance ~70 m with ~100 m traveled: rel err > 0
    far_idx = n // 2
    assert sim[far_idx] > 0.5
    # padded slots worst-case
    assert np.all(sim[n:] == 1.0)


def test_retrieval_finds_revisit():
    rng = np.random.default_rng(5)
    cfg = ScanContextConfig(num_ring=8, num_sector=24, max_radius=40.0,
                            desc_divider=1.0, num_candidates_from_tree=3)
    descs = [np.asarray(sc.make_descriptor(
        cloud_from(rng.uniform(-30, 30, size=(120, 2))), cfg)) for _ in range(10)]
    # query equals db entry 2
    cap = 16
    db = np.zeros((cap, 8, 24), np.float32)
    keys = np.zeros((cap, 8), np.float32)
    for i, d in enumerate(descs):
        db[i] = d
        keys[i] = np.asarray(sc.ring_key(jnp.asarray(d)))
    mask = np.arange(cap) < len(descs)
    res = sc.retrieve(
        jnp.asarray(descs[2]), jnp.asarray(keys[2]), jnp.asarray(db),
        jnp.asarray(keys), jnp.asarray(mask),
        jnp.zeros(cap, jnp.float32),
        num_candidates=3, search_ratio=0.25, odometry_coupled=True)
    assert int(res.index[0]) == 2
    assert float(res.dist[0]) < 1e-4
    assert bool(res.valid[0])


def test_retrieval_respects_mask():
    rng = np.random.default_rng(6)
    cfg = ScanContextConfig(num_ring=8, num_sector=24, max_radius=40.0,
                            desc_divider=1.0)
    d = np.asarray(sc.make_descriptor(
        cloud_from(rng.uniform(-30, 30, size=(120, 2))), cfg))
    cap = 8
    db = np.tile(d, (cap, 1, 1)).astype(np.float32)
    keys = np.tile(np.asarray(sc.ring_key(jnp.asarray(d))), (cap, 1)).astype(np.float32)
    res = sc.retrieve(
        jnp.asarray(d), jnp.asarray(keys[0]), jnp.asarray(db),
        jnp.asarray(keys), jnp.zeros(cap, bool), jnp.zeros(cap, jnp.float32),
        num_candidates=3, search_ratio=0.25)
    assert not bool(np.any(np.asarray(res.valid)))
