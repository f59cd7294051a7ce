"""KITTI-style odometry evaluation.

Re-implementation (vectorized NumPy, planar poses) of the reference's forked
KITTI benchmark (radar_kitti_benchmark/python/kitti_odometry.py):

- segment errors over lengths 100..800 m at a frame step
  (calc_sequence_errors, kitti_odometry.py:197-250): per segment, relative
  GT vs estimated motion; rot error from the trace formula, translation
  error normalized by segment length,
- overall Trans.err (%) and Rot.err (deg/100m) (compute_overall_err),
- ATE after 6dof (here: SE(2)) Umeyama alignment (compute_ATE,
  kitti_odometry.py:477-506),
- RPE mean/std + bias terms (compute_RPE, kitti_odometry.py:508-584),
- ``result.txt`` writer byte-compatible with the reference format
  (write_result, kitti_odometry.py:608-634) so the downstream aggregation
  scripts (evaluation/1_baseline) parse either system's outputs.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from . import trajectory as traj

SEGMENT_LENGTHS = (100.0, 200.0, 300.0, 400.0, 500.0, 600.0, 700.0, 800.0)


@dataclasses.dataclass
class SegmentError:
    first_frame: int
    r_err: float  # rad per meter
    t_err: float  # fraction (m per m)
    length: float
    speed: float


@dataclasses.dataclass
class OdometryMetrics:
    trans_err_pct: float  # Trans.err.(%)
    rot_err_deg_per_100m: float  # Rot.err.(deg/100m)
    ate: float  # ATE (m), mean norm after alignment (compute_ATE uses RMSE)
    ate_rmse: float
    rpe_trans: float
    rpe_trans_dev: float
    rpe_rot: float  # rad
    rpe_rot_dev: float
    bias_x: float
    bias_y: float
    bias_theta: float
    rmse_rpe: float
    num_segments: int

    def as_dict(self) -> Dict[str, float]:
        return dataclasses.asdict(self)


def _rel(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Batched relative planar pose a^-1 * b for [N,3] arrays."""
    c, s = np.cos(a[..., 2]), np.sin(a[..., 2])
    d = b[..., :2] - a[..., :2]
    dx = c * d[..., 0] + s * d[..., 1]
    dy = -s * d[..., 0] + c * d[..., 1]
    dth = b[..., 2] - a[..., 2]
    return np.stack([dx, dy, np.arctan2(np.sin(dth), np.cos(dth))], axis=-1)


def trajectory_distances(poses: np.ndarray) -> np.ndarray:
    """Cumulative path length (trajectory_distances, kitti_odometry.py:123)."""
    seg = np.linalg.norm(np.diff(poses[:, :2], axis=0), axis=1)
    return np.concatenate([[0.0], np.cumsum(seg)])


def calc_sequence_errors(gt: np.ndarray, est: np.ndarray, step_size: int = 10,
                         lengths: Sequence[float] = SEGMENT_LENGTHS
                         ) -> List[SegmentError]:
    """Per-(start, length) segment errors (kitti_odometry.py:197-250)."""
    n = len(gt)
    dist = trajectory_distances(gt)
    errors: List[SegmentError] = []
    for first in range(0, n, step_size):
        targets = dist[first] + np.asarray(lengths)
        idx = np.searchsorted(dist, targets, side="right")
        for len_, last in zip(lengths, idx):
            if last >= n:
                continue
            delta_gt = _rel(gt[first], gt[last])
            delta_est = _rel(est[first], est[last])
            err = _rel(delta_est, delta_gt)
            r_err = abs(err[2])  # planar rotation angle == trace formula
            t_err = float(np.linalg.norm(err[:2]))
            num_frames = last - first + 1.0
            errors.append(SegmentError(first, r_err / len_, t_err / len_,
                                       len_, len_ / (0.1 * num_frames)))
    return errors


def compute_rpe(gt: np.ndarray, est: np.ndarray):
    """Frame-to-frame relative pose errors (compute_RPE semantics)."""
    rg = _rel(gt[:-1], gt[1:])
    re = _rel(est[:-1], est[1:])
    err = _rel(re, rg)
    trans = np.linalg.norm(err[:, :2], axis=1)
    rot = np.abs(err[:, 2])
    return err, trans, rot


def evaluate(gt: np.ndarray, est: np.ndarray, *, step_size: int = 10,
             align: bool = True) -> OdometryMetrics:
    """Full KITTI evaluation of planar [N,3] trajectories."""
    assert gt.shape == est.shape
    seg = calc_sequence_errors(gt, est, step_size=step_size)
    if seg:
        t_pct = float(np.mean([e.t_err for e in seg]) * 100.0)
        r_deg = float(np.mean([e.r_err for e in seg]) / np.pi * 180.0 * 100.0)
    else:
        t_pct = r_deg = 0.0

    aligned = est.copy()
    if align:
        aligned[:, :2] = traj.align_trajectory(est, gt)
    d = np.linalg.norm(aligned[:, :2] - gt[:, :2], axis=1)
    ate_rmse = float(np.sqrt(np.mean(d * d)))
    ate_mean = float(np.mean(d))

    err, trans, rot = compute_rpe(gt, est)
    return OdometryMetrics(
        trans_err_pct=t_pct, rot_err_deg_per_100m=r_deg,
        ate=ate_rmse, ate_rmse=ate_rmse,
        rpe_trans=float(trans.mean()), rpe_trans_dev=float(trans.std()),
        rpe_rot=float(rot.mean()), rpe_rot_dev=float(rot.std()),
        bias_x=float(err[:, 0].mean()), bias_y=float(err[:, 1].mean()),
        bias_theta=float(err[:, 2].mean()),
        rmse_rpe=float(np.sqrt(np.mean(trans * trans + 0.0))),
        num_segments=len(seg),
    )


def write_result(path: str, seq: int, m: OdometryMetrics) -> None:
    """result.txt in the reference's exact format (kitti_odometry.py:608-634)."""
    lines = [
        "Sequence-nr, {} \n".format(seq),
        "Trans.err.(%), {:.5f} \n".format(m.trans_err_pct),
        "Rot.err.(deg/100m), {:.5f} \n".format(m.rot_err_deg_per_100m),
        "ATE(m), {:.5f} \n".format(m.ate),
        "RPE(m), {:.5f} \n".format(m.rpe_trans),
        "RPE-dev(m), {:.5f} \n".format(m.rpe_trans_dev),
        "RPE(deg), {:.5f} \n".format(m.rpe_rot * 180 / np.pi),
        "RPE-dev(deg), {:.5f} \n".format(m.rpe_rot_dev * 180 / np.pi),
        "bias-x(m), {:.6f} \n".format(m.bias_x),
        "bias-y(m), {:.6f} \n".format(m.bias_y),
        "bias-theta(deg), {:.6f} \n".format(m.bias_theta * 180 / np.pi),
        "RMSE (m), {:.5f} \n".format(m.rmse_rpe),
    ]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.writelines(lines)


def read_result(path: str) -> Dict[str, float]:
    out: Dict[str, float] = {}
    with open(path) as f:
        for line in f:
            parts = line.strip().split(",")
            if len(parts) == 2:
                try:
                    out[parts[0].strip()] = float(parts[1])
                except ValueError:
                    pass
    return out


def evaluate_files(gt_path: str, est_path: str, out_path: Optional[str] = None,
                   seq: int = 0, step_size: int = 10) -> OdometryMetrics:
    """Evaluate KITTI-format pose files (the eval_odom.py entry)."""
    gt = traj.read_kitti(gt_path)
    est = traj.read_kitti(est_path)
    n = min(len(gt), len(est))
    m = evaluate(gt[:n], est[:n], step_size=step_size)
    if out_path:
        write_result(out_path, seq, m)
    return m
