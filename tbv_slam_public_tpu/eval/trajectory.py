"""Trajectory alignment, error metrics and KITTI/TUM export.

Host-side NumPy port of the reference's trajectory tooling:

- Umeyama/SVD best-fit alignment (``best_fit_transform``,
  cfear_radarodometry/src/cfear_radarodometry/eval_trajectory.cpp:343-420 and
  PoseGraph::Align, posegraph.cpp:235-263),
- ATE-RMSE after alignment (kitti_odometry.py:477-506 semantics),
- KITTI 3x4 row-major and TUM file writers
  (eval_trajectory.cpp:254-311) with the planar SE(2) -> SE(3) lift.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def se2_to_matrix(pose: np.ndarray) -> np.ndarray:
    """[3] (x, y, theta) -> [4, 4] homogeneous SE(3) (z = 0)."""
    c, s = np.cos(pose[2]), np.sin(pose[2])
    m = np.eye(4)
    m[0, 0], m[0, 1], m[1, 0], m[1, 1] = c, -s, s, c
    m[0, 3], m[1, 3] = pose[0], pose[1]
    return m


def best_fit_transform(a: np.ndarray, b: np.ndarray,
                       with_scale: bool = False):
    """Least-squares rigid transform mapping points ``a`` onto ``b``.

    2D Umeyama: returns (R [2,2], t [2], scale).  Reflections are prevented
    as in the reference (det correction, eval_trajectory.cpp:380-388).
    """
    mu_a = a.mean(axis=0)
    mu_b = b.mean(axis=0)
    aa = a - mu_a
    bb = b - mu_b
    h = aa.T @ bb / a.shape[0]
    u, d, vt = np.linalg.svd(h)
    sgn = np.sign(np.linalg.det(vt.T @ u.T))
    corr = np.diag([1.0, sgn])
    r = vt.T @ corr @ u.T
    if with_scale:
        var_a = np.mean(np.sum(aa * aa, axis=1))
        scale = np.trace(np.diag(d) @ corr) / var_a
    else:
        scale = 1.0
    t = mu_b - scale * r @ mu_a
    return r, t, scale


def align_trajectory(est: np.ndarray, gt: np.ndarray,
                     with_scale: bool = False) -> np.ndarray:
    """Align est [N,>=2] xy onto gt; returns transformed est xy [N,2]."""
    r, t, s = best_fit_transform(est[:, :2], gt[:, :2], with_scale)
    return (s * (r @ est[:, :2].T)).T + t


def ate_rmse(est: np.ndarray, gt: np.ndarray, align: bool = True) -> float:
    """Absolute trajectory error RMSE over xy (kitti_odometry.py:477-506)."""
    e = align_trajectory(est, gt) if align else est[:, :2]
    d = e - gt[:, :2]
    return float(np.sqrt(np.mean(np.sum(d * d, axis=1))))


def ate_mean(est: np.ndarray, gt: np.ndarray, align: bool = True) -> float:
    e = align_trajectory(est, gt) if align else est[:, :2]
    return float(np.mean(np.linalg.norm(e - gt[:, :2], axis=1)))


def relative_pose_error(est: np.ndarray, gt: np.ndarray,
                        delta: int = 1) -> Tuple[float, float]:
    """RPE (mean translational [m], mean rotational [rad]) at frame delta."""
    def rel(p):
        c, s = np.cos(p[:-delta, 2]), np.sin(p[:-delta, 2])
        d = p[delta:, :2] - p[:-delta, :2]
        dx = c * d[:, 0] + s * d[:, 1]
        dy = -s * d[:, 0] + c * d[:, 1]
        dth = p[delta:, 2] - p[:-delta, 2]
        return np.stack([dx, dy, np.arctan2(np.sin(dth), np.cos(dth))], 1)

    re, rg = rel(est), rel(gt)
    dt = np.linalg.norm(re[:, :2] - rg[:, :2], axis=1)
    dr = np.abs(np.arctan2(np.sin(re[:, 2] - rg[:, 2]),
                           np.cos(re[:, 2] - rg[:, 2])))
    return float(dt.mean()), float(dr.mean())


def write_kitti(path: str, poses: np.ndarray) -> None:
    """KITTI format: 12 values per line, 3x4 row-major (eval_trajectory.cpp:254)."""
    with open(path, "w") as f:
        for p in poses:
            m = se2_to_matrix(p)[:3, :]
            f.write(" ".join(f"{v:.9f}" for v in m.reshape(-1)) + "\n")


def read_kitti(path: str) -> np.ndarray:
    """Read KITTI poses back as [N, 3] planar (x, y, yaw)."""
    rows = np.loadtxt(path).reshape(-1, 3, 4)
    yaw = np.arctan2(rows[:, 1, 0], rows[:, 0, 0])
    return np.stack([rows[:, 0, 3], rows[:, 1, 3], yaw], axis=1)


def write_cov(path: str, stamps: np.ndarray, covs: np.ndarray) -> None:
    """Covariance file: per line ``stamp`` then the 6x6 covariance inline
    (WriteCov, eval_trajectory.cpp:214-233).  Planar [N, 3, 3] covariances
    are lifted to 6x6 with the (x, y, yaw) block placed at rows/cols
    (0, 1, 5), matching the SE(3) ordering (x y z rx ry rz)."""
    covs = np.asarray(covs)
    with open(path, "w") as f:
        for t, c in zip(stamps, covs):
            if c.shape == (3, 3):
                m = np.zeros((6, 6))
                ix = np.asarray([0, 1, 5])
                m[np.ix_(ix, ix)] = c
            else:
                m = c.reshape(6, 6)
            f.write(f"{t:.9f} " + " ".join(str(v) for v in m.reshape(-1))
                    + "\n")


def write_tum(path: str, stamps: np.ndarray, poses: np.ndarray) -> None:
    """TUM format: stamp x y z qx qy qz qw (eval_trajectory.cpp:282-311)."""
    with open(path, "w") as f:
        for t, p in zip(stamps, poses):
            half = 0.5 * p[2]
            f.write(f"{t:.6f} {p[0]:.6f} {p[1]:.6f} 0.000000 "
                    f"0.000000 0.000000 {np.sin(half):.6f} {np.cos(half):.6f}\n")
