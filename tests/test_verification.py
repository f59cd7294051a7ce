"""CorAl entropy, logistic regression, alignment learner tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tbv_slam_public_tpu.core.config import (FeatureConfig, RadarConfig,
                                             VerificationConfig)
from tbv_slam_public_tpu.core.types import PointCloud
from tbv_slam_public_tpu.io import simulate
from tbv_slam_public_tpu.models import verification
from tbv_slam_public_tpu.ops import coral, features, logistic, radar


def cloud_from(xy, cap=512):
    xy = np.asarray(xy, np.float32)
    n = len(xy)
    return PointCloud(
        xy=jnp.asarray(np.pad(xy, ((0, cap - n), (0, 0)))),
        intensity=jnp.asarray(np.full(cap, 120.0, np.float32)),
        mask=jnp.asarray(np.arange(cap) < n),
    )


def test_coral_entropy_golden():
    """Hand-checked entropy for an isotropic Gaussian blob pair."""
    rng = np.random.default_rng(0)
    blob = rng.normal(scale=0.3, size=(120, 2))
    src = cloud_from(blob + [5, 5])
    ref = cloud_from(blob + [5, 5])  # identical
    res = coral.coral_quality(src, ref, radius=1.0)
    # joint (double density, same spread) vs sep entropy: similar dets ->
    # joint ~ sep for identical clouds
    assert abs(float(res.joint) - float(res.sep)) < 0.1
    assert float(res.overlap) > 0.9
    assert bool(res.valid)


def test_coral_separates_aligned_from_misaligned():
    rng = np.random.default_rng(1)
    world = simulate.make_world(rng, num_walls=40, extent=40.0)
    rcfg = RadarConfig(num_azimuths=200, num_range_bins=256, range_res=0.3,
                       k_strongest=12, min_distance=1.0, max_distance=70.0)
    img1 = simulate.render_scan(world, np.zeros(3), num_azimuths=200,
                                num_range_bins=256, range_res=0.3,
                                rng=np.random.default_rng(2))
    img2 = simulate.render_scan(world, np.zeros(3), num_azimuths=200,
                                num_range_bins=256, range_res=0.3,
                                rng=np.random.default_rng(3))
    _, peaks1 = radar.kstrongest_filter(img1, rcfg)
    _, peaks2 = radar.kstrongest_filter(img2, rcfg)
    p1 = coral.compact_cloud(peaks1, 1024)
    p2 = coral.compact_cloud(peaks2, 1024)

    aligned = coral.coral_quality(p1, p2, radius=1.0)
    shifted = p2.replace(xy=p2.xy + jnp.asarray([1.5, 0.8]))
    misaligned = coral.coral_quality(p1, shifted, radius=1.0)
    # joint entropy grows when clouds don't overlap coherently
    assert float(aligned.joint) < float(misaligned.joint)


def test_coral_kl_mode():
    """KL-divergence mode (VERDICT r2 missing #5; ent_cfg=kl,
    ComputeKLDiv AlignmentQuality.cpp:49-73): identical clouds score near
    the reference's KL(sep||sep) constant of -0.5 (its k=3 convention);
    misaligned clouds score strictly higher; sep stays 0 in this mode."""
    rng = np.random.default_rng(1)
    world = simulate.make_world(rng, num_walls=40, extent=40.0)
    rcfg = RadarConfig(num_azimuths=200, num_range_bins=256, range_res=0.3,
                       k_strongest=12, min_distance=1.0, max_distance=70.0)
    img1 = simulate.render_scan(world, np.zeros(3), num_azimuths=200,
                                num_range_bins=256, range_res=0.3,
                                rng=np.random.default_rng(2))
    img2 = simulate.render_scan(world, np.zeros(3), num_azimuths=200,
                                num_range_bins=256, range_res=0.3,
                                rng=np.random.default_rng(3))
    _, peaks1 = radar.kstrongest_filter(img1, rcfg)
    _, peaks2 = radar.kstrongest_filter(img2, rcfg)
    p1 = coral.compact_cloud(peaks1, 1024)
    p2 = coral.compact_cloud(peaks2, 1024)

    same = coral.coral_quality(p1, p1, radius=1.0, mode="kl")
    # src points contribute exactly -0.5 each; ref points KL(sep||joint) of
    # an identical doubled cloud is also ~-0.5 + tiny sampling effects
    assert abs(float(same.joint) + 0.5) < 0.2, float(same.joint)
    assert float(same.sep) == 0.0
    # discrimination holds for SUB-RADIUS misalignments (beyond the 1 m
    # neighborhood radius the overlap gate removes the displaced points
    # instead — the entropy mode covers that regime)
    aligned = coral.coral_quality(p1, p2, radius=1.0, mode="kl")
    shifted = p2.replace(xy=p2.xy + jnp.asarray([0.4, 0.3]))
    misaligned = coral.coral_quality(p1, shifted, radius=1.0, mode="kl")
    assert float(aligned.joint) < float(misaligned.joint)


def test_coral_no_overlap_invalid():
    src = cloud_from(np.random.default_rng(4).normal(size=(50, 2)))
    ref = cloud_from(np.random.default_rng(5).normal(size=(50, 2)) + 100.0)
    res = coral.coral_quality(src, ref, radius=1.0)
    assert not bool(res.valid)
    assert float(res.overlap) == 0.0


def test_logistic_fit_separable():
    rng = np.random.default_rng(6)
    x0 = rng.normal(size=(200, 2)) + [-2, 0]
    x1 = rng.normal(size=(200, 2)) + [2, 0]
    x = jnp.asarray(np.concatenate([x0, x1]), jnp.float32)
    y = jnp.asarray(np.concatenate([np.zeros(200), np.ones(200)]), jnp.float32)
    model = logistic.fit(x, y)
    acc = float(logistic.accuracy(model, x, y))
    assert acc > 0.95
    assert float(model.coef[0]) > 0  # positive x -> class 1


def test_logistic_matches_sklearn_direction():
    """Compare against sklearn-style balanced weighting on imbalanced data."""
    rng = np.random.default_rng(7)
    x0 = rng.normal(size=(300, 1)) - 1.0
    x1 = rng.normal(size=(30, 1)) + 1.0
    x = jnp.asarray(np.concatenate([x0, x1]), jnp.float32)
    y = jnp.asarray(np.concatenate([np.zeros(300), np.ones(30)]), jnp.float32)
    bal = logistic.fit(x, y, balanced=True)
    unbal = logistic.fit(x, y, balanced=False)
    # balanced fit shifts the boundary toward the majority class
    assert float(bal.intercept) > float(unbal.intercept)


def test_logistic_save_load_roundtrip(tmp_path):
    m = logistic.from_values(0.5, [1.0, -2.0, 3.0])
    p = str(tmp_path / "coefs.txt")
    logistic.save_coefficients(m, p)
    m2 = logistic.load_coefficients(p)
    assert float(m2.intercept) == pytest.approx(0.5)
    np.testing.assert_allclose(np.asarray(m2.coef), [1, -2, 3], rtol=1e-5)


def test_verification_probability_published_coefs():
    cfg = VerificationConfig()
    model = verification.default_loop_model(cfg)
    # a good loop: consistent odometry (0), similar contexts (low), decent
    # alignment score (positive)
    p_good = float(verification.verification_probability(model, 0.0, 0.3, 5.0))
    p_bad = float(verification.verification_probability(model, 1.0, 1.5, -5.0))
    assert p_good > 0.9
    assert p_bad < 0.05


def test_alignment_learner_separates(tmp_path):
    """End-to-end M5: train on perturbed pairs, aligned scores higher
    (the analogue of scan_learning_interface_tests.cpp:10-78)."""
    rng = np.random.default_rng(8)
    world = simulate.make_world(rng, num_walls=50, extent=50.0)
    rcfg = RadarConfig(num_azimuths=200, num_range_bins=256, range_res=0.3,
                       k_strongest=12, min_distance=1.0, max_distance=70.0)
    fcfg = FeatureConfig(resolution=3.0, cell_capacity=256, grid_extent=80.0)
    vcfg = VerificationConfig(peaks_capacity=1024)

    learner = verification.AlignmentLearner(vcfg)
    poses = [np.array([1.6 * i, 0.1 * i, 0.02 * i]) for i in range(5)]
    scans = []
    for i, p in enumerate(poses):
        img = simulate.render_scan(world, p, num_azimuths=200,
                                   num_range_bins=256, range_res=0.3,
                                   rng=np.random.default_rng(10 + i))
        cloud, peaks = radar.kstrongest_filter(img, rcfg)
        cells = features.compute_cells(cloud, fcfg)
        peaks = coral.compact_cloud(peaks, vcfg.peaks_capacity)
        scans.append((peaks, cells, p))
        learner.add_training_pair(peaks, cells, p)

    assert learner.num_samples >= 13 * 3
    learner.fit()

    # aligned pair scores higher than a (1 m, 1 m) perturbed pair
    (pa, ca, Ta), (pb, cb, Tb) = scans[2], scans[3]
    x_aligned = verification.alignment_features(
        pb, cb, jnp.asarray(Tb, jnp.float32), pa, ca,
        jnp.asarray(Ta, jnp.float32), vcfg)
    Tb_off = np.asarray(Tb) + [1.0, 1.0, 0.0]
    x_off = verification.alignment_features(
        pb, cb, jnp.asarray(Tb_off, jnp.float32), pa, ca,
        jnp.asarray(Ta, jnp.float32), vcfg)
    s_aligned = float(learner.alignment_quality(jnp.asarray(x_aligned)))
    s_off = float(learner.alignment_quality(jnp.asarray(x_off)))
    assert s_aligned > s_off

    # save/load roundtrip preserves the score
    path = str(tmp_path / "alignment.txt")
    learner.save(path)
    learner2 = verification.AlignmentLearner(vcfg)
    learner2.load(path)
    assert float(learner2.alignment_quality(jnp.asarray(x_aligned))) == \
        pytest.approx(s_aligned, rel=1e-4)


def test_odometry_consistency():
    # straight out-and-back: endpoints coincide -> consistent (0)
    fwd = np.stack([np.linspace(0, 50, 26), np.zeros(26)], 1)
    back = fwd[::-1][1:]
    path = np.concatenate([fwd, back])
    sim = verification.odometry_consistency(path, 0, len(path) - 1, 0.05)
    assert sim < 1e-6
    # far endpoints with short travel -> inconsistent (1)
    sim2 = verification.odometry_consistency(
        np.array([[0.0, 0], [30.0, 0]]), 0, 1, 0.05)
    assert sim2 > 0.99


def test_loop_classifier_reproduces_published_coefficients():
    """REAL-DATA golden parity: fitting our on-device IRLS logistic
    regression on the reference's actual loop training data (4390 rows of
    Oxford candidate features, model_parameters/tbv_model_8.txt, committed
    as an npz fixture) must reproduce the PUBLISHED
    trained_loop_classifier.txt coefficients — intercept 4.53196, coefs
    [-5.06267, -11.9655, 0.268186] — i.e. the exact model the reference
    shipped (sklearn class_weight="balanced", alignmentinterface.cpp:205)."""
    import os

    fx = os.path.join(os.path.dirname(__file__), "fixtures",
                      "tbv_model_8.npz")
    data = np.load(fx)["data"]
    y = jnp.asarray(data[:, 0], jnp.float32)
    x = jnp.asarray(data[:, 1:4], jnp.float32)
    m = logistic.fit(x, y, balanced=True)
    np.testing.assert_allclose(float(m.intercept), 4.53196, atol=2e-3)
    np.testing.assert_allclose(np.asarray(m.coef),
                               [-5.06267, -11.9655, 0.268186],
                               rtol=2e-3, atol=2e-3)
    # training metrics in line with the published loop/result.txt
    # (98.2% accuracy, 92.4% precision, 98.3% recall on job_1's data)
    p = np.asarray(logistic.predict_proba(m, x))
    pred = p > 0.5
    lab = data[:, 0] > 0.5
    acc = (pred == lab).mean()
    tp = (pred & lab).sum()
    prec = tp / max(pred.sum(), 1)
    rec = tp / lab.sum()
    assert acc > 0.97 and prec > 0.90 and rec > 0.95, (acc, prec, rec)
