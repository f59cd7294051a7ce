"""Evaluation-layer tests: KITTI segment metrics, trajectory IO, loop labels."""
import os

import numpy as np
import pytest

from tbv_slam_public_tpu.eval import kitti, loops, trajectory


def _circle_traj(n=2000, radius=200.0):
    ang = np.linspace(0, 1.5 * np.pi, n)
    gt = np.stack([radius * np.cos(ang), radius * np.sin(ang),
                   np.arctan2(np.cos(ang), -np.sin(ang))], axis=1)
    return gt


def test_kitti_zero_error_on_identical():
    gt = _circle_traj()
    m = kitti.evaluate(gt, gt.copy())
    assert m.num_segments > 0
    assert m.trans_err_pct < 1e-6
    assert m.rot_err_deg_per_100m < 1e-6
    assert m.ate_rmse < 1e-6


def test_kitti_known_drift():
    """2% along-track scale drift must measure ~2% translational error."""
    gt = _circle_traj()
    dist = kitti.trajectory_distances(gt)
    est = gt.copy()
    # stretch path length by 2%: inflate radius by 2%
    est[:, 0] = gt[:, 0] * 1.02
    est[:, 1] = gt[:, 1] * 1.02
    m = kitti.evaluate(gt, est, align=True)
    assert 1.0 < m.trans_err_pct < 3.5, m.trans_err_pct
    assert m.num_segments > 100


def test_kitti_result_roundtrip(tmp_path):
    gt = _circle_traj(800)
    est = gt + np.random.default_rng(0).normal(0, 0.05, gt.shape)
    m = kitti.evaluate(gt, est)
    p = str(tmp_path / "result.txt")
    kitti.write_result(p, 0, m)
    parsed = kitti.read_result(p)
    assert abs(parsed["Trans.err.(%)"] - m.trans_err_pct) < 1e-4
    assert abs(parsed["ATE(m)"] - m.ate) < 1e-4


def test_kitti_file_eval(tmp_path):
    gt = _circle_traj(600)
    est = gt + 0.01
    gp, ep = str(tmp_path / "gt.txt"), str(tmp_path / "est.txt")
    trajectory.write_kitti(gp, gt)
    trajectory.write_kitti(ep, est)
    m = kitti.evaluate_files(gp, ep, str(tmp_path / "result.txt"))
    assert os.path.exists(tmp_path / "result.txt")
    assert m.ate_rmse < 0.05  # constant offset absorbed by alignment


def test_tum_writer(tmp_path):
    gt = _circle_traj(10)
    p = str(tmp_path / "t.tum")
    trajectory.write_tum(p, np.arange(10.0), gt)
    rows = np.loadtxt(p)
    assert rows.shape == (10, 8)
    np.testing.assert_allclose(rows[:, 1], gt[:, 0], atol=1e-5)


def test_loop_labels():
    # square loop revisiting the start
    n = 100
    t = np.linspace(0, 2 * np.pi, n)
    gt = np.stack([30 * np.cos(t) - 30, 30 * np.sin(t), t + np.pi / 2], axis=1)
    # frame n-1 is back at the start -> true loop vs frame 0
    t_gt_be = np.zeros(3)
    a, b = gt[n - 1], gt[0]
    c, s = np.cos(a[2]), np.sin(a[2])
    d = b[:2] - a[:2]
    t_gt_be = np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1],
                        np.arctan2(np.sin(b[2] - a[2]), np.cos(b[2] - a[2]))])
    is_loop, reg_ok = loops.candidate_labels(gt, n - 1, 0, t_gt_be)
    assert is_loop and reg_ok
    # wrong registration: 10 m off
    is_loop2, reg_ok2 = loops.candidate_labels(
        gt, n - 1, 0, t_gt_be + np.array([10.0, 0, 0]))
    assert is_loop2 and not reg_ok2
    # mid-sequence frame far from everything >= 10 idx away
    is_loop3, _ = loops.candidate_labels(gt, n // 2, 0, np.zeros(3))
    assert not is_loop3


def test_classifier_metrics_and_csv(tmp_path):
    rng = np.random.default_rng(0)
    n = 400
    labels = (rng.uniform(size=n) < 0.3).astype(float)
    probs = np.clip(labels * 0.8 + rng.normal(0, 0.15, n) + 0.1, 0, 1)
    m = loops.classifier_metrics(probs, labels)
    assert m.auc > 0.9
    assert m.accuracy > 0.8
    ths, p, r = loops.pr_curve(probs, labels)
    assert p.shape == ths.shape == r.shape
    # recall decreases with threshold
    assert r[0] >= r[-1]

    log = [dict(id_from=50, id_to=0, prob=float(probs[i]), odom_bounds=0.1,
                sc_sim=0.2, alignment_quality=1.0, guess_nr=0,
                t_be=[0.0, 0.0, 0.0], reg_ok=True) for i in range(5)]
    gt = _circle_traj(100, radius=3.0)  # small circle -> everything loops
    labeled = loops.label_candidate_log(log, gt)
    path = str(tmp_path / "loop.csv")
    loops.write_loop_csv(path, labeled)
    rows = loops.read_loop_csv(path)
    assert len(rows) == 5
    assert "is_loop" in rows[0]


REF_JOB = "/root/reference/evaluation/data/oxford_all_tbv_model_8/job_0/"


@pytest.mark.skipif(not os.path.isdir(REF_JOB),
                    reason="reference evaluation data not mounted")
def test_kitti_matches_published_oxford_results():
    """Evaluate the reference's own published Oxford trajectories with OUR
    evaluator: every headline number must reproduce the checked-in
    est/result.txt (radar_kitti_benchmark parity on real data)."""
    gt = trajectory.read_kitti(REF_JOB + "gt/00.txt")
    est = trajectory.read_kitti(REF_JOB + "est/00.txt")
    m = kitti.evaluate(gt, est, step_size=10)
    ref = kitti.read_result(REF_JOB + "est/result.txt")
    assert abs(m.trans_err_pct - ref["Trans.err.(%)"]) < 1e-4
    assert abs(m.rot_err_deg_per_100m - ref["Rot.err.(deg/100m)"]) < 1e-4
    assert abs(m.ate - ref["ATE(m)"]) < 1e-4
    assert abs(m.rpe_trans - ref["RPE(m)"]) < 1e-4
    assert abs(m.rpe_trans_dev - ref["RPE-dev(m)"]) < 1e-4
    assert abs(m.rmse_rpe - ref["RMSE (m)"]) < 1e-4
    # rotation RPE: reference uses arccos((tr-1)/2) whose conditioning
    # inflates tiny angles; our atan2 form agrees to ~3% only.
    assert abs(np.degrees(m.rpe_rot) - ref["RPE(deg)"]) < 0.005


# NOTE: odom/01.txt holds all 8617 frames while gt/00.txt holds the 4470
# keyframes — the full-frame GT the reference used for its odom/result.txt is
# not checked in, so only the est-side numbers can be reproduced here.


def test_inject_odometry_drift_calibrates_to_target():
    """simulate.inject_odometry_drift: chained drifted poses hit the ATE
    target and stay consistent with the perturbed constraints."""
    import jax.numpy as jnp

    from tbv_slam_public_tpu.core import se2
    from tbv_slam_public_tpu.eval.trajectory import ate_rmse
    from tbv_slam_public_tpu.io import simulate

    gt = simulate.loop_trajectory(200, radius=30.0, step=1.6, laps=2.0)
    idx = np.asarray([(i, i + 1) for i in range(len(gt) - 1)], np.int32)
    meas = np.asarray([np.asarray(se2.relative(jnp.asarray(gt[i]),
                                               jnp.asarray(gt[i + 1])))
                       for i in range(len(gt) - 1)], np.float32)
    target = 3.0
    poses, dmeas = simulate.inject_odometry_drift(gt, idx, meas, gt,
                                                  target_ate_m=target, seed=1)
    ate = ate_rmse(poses, gt)
    assert abs(ate - target) < 0.2 * target, ate
    # re-chaining the drifted constraints reproduces the drifted poses
    chain = np.asarray(gt, np.float32).copy()
    for e in range(len(idx)):
        a, b = idx[e]
        chain[b] = np.asarray(se2.compose(jnp.asarray(chain[a]),
                                          jnp.asarray(dmeas[e])))
    np.testing.assert_allclose(chain[:, :2], poses[:, :2], atol=2e-3)
    dth = np.arctan2(np.sin(chain[:, 2] - poses[:, 2]),
                     np.cos(chain[:, 2] - poses[:, 2]))
    np.testing.assert_allclose(dth, 0.0, atol=2e-3)
    # translation noise stays at the calibrated scale (not exploding)
    step_err = np.linalg.norm((dmeas - meas)[:, :2], axis=1)
    step_len = np.linalg.norm(meas[:, :2], axis=1)
    assert np.percentile(step_err / np.maximum(step_len, 1e-9), 95) < 0.1
