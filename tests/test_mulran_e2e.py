"""MulRan-flavored dataset -> odometry smoke test (VERDICT r4 next #8).

Builds a MulRan release-layout directory on disk (nanosecond-stamped radar
pngs under sensor_data/radar/polar + global_pose.csv), renders simulated
scans INTO that layout, and drives the real ingestion path —
``open_sequence("mulran:...")`` with its rot90 preprocessing and GT
interpolation (radarDriver::Callback, radar_driver.cpp:74-90;
offline_odometry.cpp:80-96) — through the odometry pipeline end-to-end.
"""
import os

import numpy as np
import pytest

from tbv_slam_public_tpu.core.config import (FeatureConfig, OdometryConfig,
                                             RadarConfig, RegistrationConfig,
                                             TBVConfig)
from tbv_slam_public_tpu.io import oxford, simulate

A, R = 64, 3360  # load_mulran_scan always emits 3360 range bins
RES = 0.05952  # MulRan bin resolution (open_sequence meta)


@pytest.fixture(scope="module")
def mulran_dir(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("mulran_seq")
    polar = root / "sensor_data" / "radar" / "polar"
    polar.mkdir(parents=True)
    rng = np.random.default_rng(3)
    world = simulate.make_world(rng, num_walls=60, extent=80.0)
    n = 8
    poses = [np.asarray([0.8 * i, 0.05 * i, 0.01 * i], np.float32)
             for i in range(n)]
    rows = []
    for i, pose in enumerate(poses):
        img = simulate.render_scan(world, pose, num_azimuths=A,
                                   num_range_bins=R, range_res=RES, rng=rng)
        # MulRan pngs are stored pre-rot90: invert the loader's rot90(CCW)
        raw = np.rot90(img, -1)
        ns = int((1.6e18 + i * 0.25e9))  # 19-digit nanosecond stamps
        Image.fromarray(raw.astype(np.uint8)).save(polar / f"{ns}.png")
        c, s = np.cos(pose[2]), np.sin(pose[2])
        rows.append([ns, c, -s, 0.0, pose[0], s, c, 0.0, pose[1],
                     0.0, 0.0, 1.0, 0.0])
    np.savetxt(root / "global_pose.csv", np.asarray(rows, np.float64),
               delimiter=",", fmt="%.9f")
    return str(root), poses


def test_mulran_sequence_drives_odometry(mulran_dir):
    root, poses = mulran_dir
    frames, meta = oxford.open_sequence(f"mulran:{root}")
    assert meta["num_range_bins"] == R
    assert meta["range_res"] == RES

    from tbv_slam_public_tpu.models.odometry import OdometryPipeline

    cfg = TBVConfig(
        radar=RadarConfig(num_azimuths=A, num_range_bins=R, range_res=RES,
                          k_strongest=12, min_distance=2.5,
                          max_distance=120.0),
        features=FeatureConfig(resolution=3.0, cell_capacity=256,
                               grid_extent=150.0),
        registration=RegistrationConfig(cost="P2L", weight_option=4),
        odometry=OdometryConfig(submap_scan_size=3, compensate=False),
    )
    pipe = OdometryPipeline(cfg)
    n_gt = 0
    for fr in frames:
        assert fr.image.shape == (A, R)  # rot90 applied by the loader
        if fr.gt_pose is not None:
            n_gt += 1
        pipe.process(fr.image, fr.stamp, gt_pose=fr.gt_pose)
    assert n_gt == len(frames)  # global_pose.csv found + interpolated
    assert len(pipe.kf_poses) >= 2

    # odometry should roughly track the 0.8 m/frame forward motion
    est = np.asarray(pipe.kf_poses[-1])
    gt_last = poses[-1]
    err = np.linalg.norm(est[:2] - gt_last[:2])
    assert err < 1.5, (est, gt_last)
