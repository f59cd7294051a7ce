"""Multi-chip paths on the simulated 8-device CPU mesh: sharded candidate
waves, data-parallel alignment training, distributed PGO."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tbv_slam_public_tpu.core.config import (FeatureConfig, PGOConfig,
                                             RadarConfig, TBVConfig,
                                             VerificationConfig)
from tbv_slam_public_tpu.core.types import (LOOP_APPEARANCE, ODOMETRY, Cells,
                                            PointCloud)
from tbv_slam_public_tpu.ops import features, logistic, posegraph, radar
from tbv_slam_public_tpu.io import simulate
from tbv_slam_public_tpu.parallel import candidates as par_cand
from tbv_slam_public_tpu.parallel import pgo as par_pgo

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs a multi-device mesh")


def tiny_cfg():
    return TBVConfig(
        radar=RadarConfig(num_azimuths=60, num_range_bins=100, range_res=0.5,
                          k_strongest=6, min_distance=1.0, max_distance=45.0),
        features=FeatureConfig(cell_capacity=128, grid_extent=50.0),
        verification=VerificationConfig(peaks_capacity=512),
    )


def _scan(cfg, pose, world, rng):
    img = simulate.render_scan(
        world, pose, num_azimuths=cfg.radar.num_azimuths,
        num_range_bins=cfg.radar.num_range_bins,
        range_res=cfg.radar.range_res, rng=rng)
    cloud, peaks = radar.kstrongest_filter(jnp.asarray(img), cfg.radar)
    cells = features.compute_cells(cloud, cfg.features)
    return peaks, cells


def test_sharded_candidate_wave():
    cfg = tiny_cfg()
    rng = np.random.default_rng(0)
    world = simulate.make_world(rng, num_walls=40, extent=40.0)
    n_dev = len(jax.devices())
    mesh = par_cand.make_mesh()

    q_peaks, q_cells = _scan(cfg, np.zeros(3), world, rng)
    k = n_dev  # one candidate per device
    cands = [_scan(cfg, np.array([0.5 * i, 0.2 * i, 0.02 * i]), world, rng)
             for i in range(k)]
    c_peaks = jax.tree.map(lambda *xs: jnp.stack(xs), *[c[0] for c in cands])
    c_cells = jax.tree.map(lambda *xs: jnp.stack(xs), *[c[1] for c in cands])

    align = logistic.from_values(cfg.verification.alignment_coefs[0],
                                 cfg.verification.alignment_coefs[1:])
    loop = logistic.from_values(cfg.verification.loop_coefs[0],
                                cfg.verification.loop_coefs[1:])
    res = par_cand.sharded_register_and_verify(
        mesh, q_cells, q_peaks, c_cells, c_peaks,
        jnp.zeros((k, 3)), jnp.zeros((k,)),
        0.2 * jnp.ones((k,)), 0.1 * jnp.ones((k,)), jnp.ones((k,), bool),
        align, loop, cfg)
    res = jax.tree.map(np.asarray, res)
    assert res.t_be.shape == (k, 3)
    assert res.reg_ok.all()
    # candidate 0 is the same place as the query: registration must find ~0
    assert np.linalg.norm(res.t_be[0][:2]) < 0.3


def test_alignment_training_step_dp():
    cfg = tiny_cfg()
    rng = np.random.default_rng(1)
    world = simulate.make_world(rng, num_walls=40, extent=40.0)
    mesh = par_cand.make_mesh()
    n_dev = len(jax.devices())
    b = n_dev

    cur, prev = [], []
    for i in range(b):
        base = np.array([3.0 * i, 1.0 * i, 0.1 * i])
        cur.append(_scan(cfg, base + np.array([1.0, 0.3, 0.05]), world, rng))
        prev.append(_scan(cfg, base, world, rng))
    stack = lambda xs: jax.tree.map(lambda *a: jnp.stack(a), *xs)
    cur_pose = jnp.asarray([[1.0, 0.3, 0.05]] * b)
    prev_pose = jnp.zeros((b, 3))

    model, x, y = par_cand.alignment_training_step(
        mesh, stack([c[0] for c in cur]), stack([c[1] for c in cur]), cur_pose,
        stack([p[0] for p in prev]), stack([p[1] for p in prev]), prev_pose,
        cfg)
    assert x.shape == (13 * b, 6)
    # the fitted model must separate aligned from perturbed
    p = np.asarray(logistic.predict_proba(model, x))
    y = np.asarray(y)
    assert p[y == 1].mean() > p[y == 0].mean()


def test_distributed_pgo_matches_single_device():
    cfg = PGOConfig()
    # loop graph as in test_posegraph
    from tests.test_posegraph import _build_edges, _simulated_loop_graph
    rng = np.random.default_rng(0)
    gt, poses, rels = _simulated_loop_graph(rng)
    n = len(poses)
    edges = _build_edges(rels, gt, n, cfg, loop_pairs=[(0, n - 1), (3, n - 4)])
    # edge capacity (64) divides the 8-device mesh
    mesh = par_pgo.make_mesh()
    res_d = par_pgo.optimize_distributed(
        mesh, jnp.asarray(poses, jnp.float32), jnp.ones((n,), bool), edges, cfg)
    res_s = posegraph.optimize(jnp.asarray(poses, jnp.float32),
                               jnp.ones((n,), bool), edges, cfg, solver="cg")
    np.testing.assert_allclose(np.asarray(res_d.poses)[:, :2],
                               np.asarray(res_s.poses)[:, :2], atol=0.05)
    err0 = np.linalg.norm(poses[:, :2] - gt[:, :2], axis=1).mean()
    err1 = np.linalg.norm(np.asarray(res_d.poses)[:n, :2] - gt[:, :2],
                          axis=1).mean()
    assert err1 < 0.5 * err0


def test_multihost_helpers_single_process():
    from tbv_slam_public_tpu.parallel import multihost

    pid, n = multihost.process_info()
    assert pid == 0 and n == 1
    assert multihost.my_jobs(list(range(7))) == list(range(7))
    assert multihost.all_hosts_sum(3.5) == 3.5
    mesh = multihost.global_mesh()
    assert mesh.devices.size == len(jax.devices())
    rep = multihost.scaling_report(100, 10.0)
    assert rep["frames_per_s"] == pytest.approx(10.0)
    assert rep["hosts"] == 1
