"""Generate tests/fixtures/oxford_10-12-32_real_odometry.npz.

The reference publishes, for Oxford 10-12-32 (job_0 of
evaluation/data/oxford_all_tbv_model_8):
- odom/01.txt — the CFEAR radar-odometry trajectory (8617 frames, KITTI 3x4)
- gt/00.txt  — keyframe ground truth (4470 keyframes)
- est/00.txt — the TBV SLAM estimate (ATE 4.0716 m, est/result.txt:4)

This script resamples the real odometry at each keyframe's GT arc-length
(arc-length is the gauge-free correspondence; scan-matching odometry has
~1% scale error but metres of absolute drift) and stores the [4470, 3]
planar odometry-at-keyframes trajectory.  The fixture carries the REAL
drift profile of the reference front-end, so PGO evidence
(tests/test_posegraph.py, bench.py stage 3) runs on measured — not
synthesized — odometry error.

Run from the repo root with /root/reference present:
    python scripts/make_real_odometry_fixture.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tbv_slam_public_tpu.eval import trajectory as tj
from tbv_slam_public_tpu.io import simulate

JOB0 = "/root/reference/evaluation/data/oxford_all_tbv_model_8/job_0"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "oxford_10-12-32_real_odometry.npz")


def main():
    odom = tj.read_kitti(os.path.join(JOB0, "odom", "01.txt"))
    gt = tj.read_kitti(os.path.join(JOB0, "gt", "00.txt"))
    est = tj.read_kitti(os.path.join(JOB0, "est", "00.txt"))

    d = np.linalg.norm(np.diff(gt[:, :2], axis=0), axis=1)
    s_gt = np.concatenate([[0.0], np.cumsum(d)])
    odom_kf = simulate.interpolate_at_arclength(odom, s_gt)

    ate_odom = tj.ate_rmse(odom_kf, gt)
    ate_est = tj.ate_rmse(est, gt)
    print(f"keyframes: {len(gt)}  odom frames: {len(odom)}")
    print(f"real odometry ATE at keyframes: {ate_odom:.3f} m")
    print(f"published SLAM ATE:             {ate_est:.4f} m "
          "(must be 4.0716, est/result.txt)")
    assert abs(ate_est - 4.0716) < 1e-3

    np.savez_compressed(OUT, odom=odom_kf.astype(np.float32),
                        gt=gt.astype(np.float32),
                        est=est.astype(np.float32))
    print("wrote", OUT, os.path.getsize(OUT), "bytes")


if __name__ == "__main__":
    main()
