"""Checkpoint tests: simple_graph save/load roundtrip and the offline split
(odometry once -> SLAM from checkpoint)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tbv_slam_public_tpu.core import se2
from tbv_slam_public_tpu.io import checkpoint, simulate
from tbv_slam_public_tpu.models.odometry import OdometryPipeline
from tbv_slam_public_tpu.models.slam import run_offline_slam
from tests.test_slam import slam_config


@pytest.fixture(scope="module")
def odometry_run():
    seq = simulate.make_sequence(
        num_frames=120, seed=3, num_azimuths=120, num_range_bins=200,
        range_res=0.35, traj_kwargs=dict(radius=13.0, step=0.8, laps=1.25))
    cfg = slam_config()
    pipe = OdometryPipeline(cfg)
    g0 = seq.gt_poses[0]
    for i in range(seq.images.shape[0]):
        gt_rel = np.asarray(se2.relative(jnp.asarray(g0),
                                         jnp.asarray(seq.gt_poses[i])))
        pipe.process(seq.images[i], stamp=i * 0.25, gt_pose=gt_rel)
    return cfg, pipe


def test_simple_graph_roundtrip(tmp_path, odometry_run):
    cfg, pipe = odometry_run
    g = checkpoint.from_odometry(pipe)
    assert g.num_keyframes == len(pipe.kf_poses)
    assert g.kf_gt is not None
    path = str(tmp_path / "simple_graph.npz")
    checkpoint.save_simple_graph(path, g)
    g2 = checkpoint.load_simple_graph(path)
    np.testing.assert_allclose(g2.kf_poses, g.kf_poses)
    np.testing.assert_allclose(np.asarray(g2.cells.mean),
                               np.asarray(g.cells.mean))
    np.testing.assert_allclose(g2.constraints_meas, g.constraints_meas)
    assert g2.constraints_idx.shape[0] == g.num_keyframes - 1


def test_offline_slam_from_checkpoint(tmp_path, odometry_run):
    cfg, pipe = odometry_run
    path = str(tmp_path / "simple_graph.npz")
    checkpoint.save_simple_graph(path, checkpoint.from_odometry(pipe))
    g = checkpoint.load_simple_graph(path)

    slam = run_offline_slam(cfg, g)
    s = slam.summary
    assert s.num_keyframes == g.num_keyframes
    assert s.num_loops >= 1
    assert s.metrics is not None
    # optimized trajectory at least as good as raw odometry
    gt = slam.graph.gt_array()
    from tbv_slam_public_tpu.eval import trajectory as tj
    ate_odom = tj.ate_rmse(g.kf_poses, gt)
    assert s.metrics["ate_rmse"] <= ate_odom * 1.05


def test_full_graph_roundtrip(tmp_path, odometry_run):
    cfg, pipe = odometry_run
    g = checkpoint.from_odometry(pipe)
    slam = run_offline_slam(cfg, g)
    path = str(tmp_path / "full_graph.npz")
    checkpoint.save_full_graph(path, slam.graph)
    g2 = checkpoint.load_full_graph(path, cfg)
    assert g2.num_nodes == slam.graph.num_nodes
    assert g2.num_loops() == slam.graph.num_loops()
    np.testing.assert_allclose(g2.poses_array(), slam.graph.poses_array(),
                               atol=1e-5)


def test_batched_wave_equals_sequential(odometry_run):
    """Offline wave mode (process_all_batched) must accept the same loop
    constraints as the per-keyframe sequential path."""
    cfg, pipe = odometry_run
    g = checkpoint.from_odometry(pipe)

    seq = run_offline_slam(cfg, g, batched=False)
    bat = run_offline_slam(cfg, g, batched=True)

    def key(c):
        return (c["idx"], c["etype"])

    seq_loops = sorted([key(e) for e in seq.graph.edges if e["etype"] != 0])
    bat_loops = sorted([key(e) for e in bat.graph.edges if e["etype"] != 0])
    assert bat_loops == seq_loops and len(bat_loops) >= 1
    # identical relative poses for the shared constraints
    seq_map = {key(e): e["meas"] for e in seq.graph.edges if e["etype"] != 0}
    bat_map = {key(e): e["meas"] for e in bat.graph.edges if e["etype"] != 0}
    for k in seq_map:
        np.testing.assert_allclose(bat_map[k], seq_map[k], atol=1e-4)
    # same number of evaluated candidates
    assert len(bat.loops.candidate_log) == len(seq.loops.candidate_log)


def test_full_graph_scan_payload_resume(tmp_path, odometry_run):
    """full_graph with scan payloads (posegraph.cpp:264-294 parity): the
    loop closer must be resumable from the checkpoint, not just the poses."""
    cfg, pipe = odometry_run
    g = checkpoint.from_odometry(pipe)
    slam = run_offline_slam(cfg, g)
    path = str(tmp_path / "full_graph_payload.npz")
    checkpoint.save_full_graph(path, slam.graph, slam=slam)
    slam2 = checkpoint.load_full_graph_slam(path, cfg)
    assert slam2.graph.num_nodes == slam.graph.num_nodes
    assert slam2.graph.num_loops() == slam.graph.num_loops()
    assert len(slam2.loops.kf_peaks) == slam.graph.num_nodes
    np.testing.assert_allclose(
        np.asarray(slam2.loops.kf_peaks[0].xy),
        np.asarray(slam.loops.kf_peaks[0].xy), atol=1e-6)
    # re-running the batched wave from the restored payloads reproduces the
    # SAME loop constraints (re-verification from checkpoint)
    slam2.loops._processed = 0
    relc = slam2.loops.process_all_batched()
    orig = sorted((e["idx"] for e in slam.graph.edges if e["etype"] != 0))
    redo = sorted(((c.id_from, c.id_to) for c in relc))
    assert redo == orig


def test_measured_cov_flows_from_checkpoint(tmp_path, odometry_run):
    """replace_cov_by_identity=false: registration covariances stored in the
    simple_graph must reach the PGO whitening (VERDICT r1 #4)."""
    import dataclasses

    import jax.numpy as jnp

    from tbv_slam_public_tpu.ops import posegraph

    cfg, pipe = odometry_run
    cfg2 = dataclasses.replace(
        cfg, pgo=dataclasses.replace(cfg.pgo, replace_cov_by_identity=False))
    g = checkpoint.from_odometry(pipe)
    slam = run_offline_slam(cfg2, g)
    poses, node_mask, edges = slam.graph._padded(
        cfg2.pgo.edge_capacity_chunk)
    si = np.asarray(edges.sqrt_info)
    e = len(slam.graph.edges)
    default = np.asarray(jax.vmap(jnp.diag)(posegraph.default_sqrt_info(
        edges.etype, cfg2.pgo)))
    # at least the odometry edges carry measured (non-default) whitening
    odo_rows = [k for k, ed in enumerate(slam.graph.edges)
                if ed["etype"] == 0 and ed.get("cov") is not None]
    assert odo_rows, "odometry constraints should carry covariances"
    assert not np.allclose(si[odo_rows], default[odo_rows])
