"""Dataset readers: Oxford Radar RobotCar and MulRan polar radar scans.

Bag-free ingestion (the reference consumes rosbags; SURVEY §7.3.5): reads the
standard dataset layouts directly.

Oxford (dataset release format):
- ``<dir>/radar/<timestamp>.png``: [400, 11 + 3768] uint8 polar scans; the
  first 11 columns carry per-azimuth metadata (8 bytes UNIX timestamp,
  2 bytes sweep counter, 1 byte valid flag), power data starts at column 11.
- ``<dir>/gt/radar_odometry.csv``: relative radar odometry ground truth with
  columns source/destination timestamps and (x, y, z, roll, pitch, yaw).

MulRan:
- ``<dir>/sensor_data/radar/polar/<timestamp>.png`` (or a flat dir of pngs):
  polar scans that the reference resizes to the Navtech bin count and rotates
  90 degrees CCW before processing (radar_driver.cpp:74-90); the same
  transform is applied here.

Both yield frames as (uint8 polar image [A, R], stamp seconds, optional GT
pose [3]) — the input of models.odometry / models.slam.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Iterator, List, Optional, Tuple

import numpy as np

OXFORD_META_COLUMNS = 11  # timestamp(8) + sweep counter(2) + valid(1)


def _read_png(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path))


@dataclasses.dataclass
class RadarFrame:
    image: np.ndarray  # [A, R] uint8 polar power returns
    stamp: float  # seconds
    gt_pose: Optional[np.ndarray] = None  # [3] (x, y, yaw), world frame


def load_oxford_scan(path: str) -> np.ndarray:
    """One Oxford radar png -> [400, 3768] uint8 power data."""
    img = _read_png(path)
    if img.ndim == 3:
        img = img[..., 0]
    return np.ascontiguousarray(img[:, OXFORD_META_COLUMNS:])


def load_mulran_scan(path: str, num_range_bins: int = 3360) -> np.ndarray:
    """One MulRan radar png with the reference's preprocessing:
    resize to the expected bin count and rotate 90 deg CCW
    (radarDriver::Callback, radar_driver.cpp:74-90)."""
    img = _read_png(path)
    if img.ndim == 3:
        img = img[..., 0]
    img = np.rot90(img)  # 90 deg CCW
    if img.shape[1] != num_range_bins:
        import cv2

        img = cv2.resize(img, (num_range_bins, img.shape[0]),
                         interpolation=cv2.INTER_NEAREST)
    return np.ascontiguousarray(img)


def _scan_files(radar_dir: str) -> List[Tuple[float, str]]:
    out = []
    for name in sorted(os.listdir(radar_dir)):
        if not name.endswith(".png"):
            continue
        stem = name[:-4]
        try:
            raw = int(stem)
        except ValueError:
            continue
        # Oxford stamps pngs in microseconds (16 digits), MulRan in
        # nanoseconds (19 digits) — infer the unit from the magnitude.
        stamp = raw * (1e-9 if raw > 10 ** 17 else 1e-6)
        out.append((stamp, os.path.join(radar_dir, name)))
    return out


def read_radar_odometry_gt(path: str) -> np.ndarray:
    """gt/radar_odometry.csv -> [N, 4] (dest_stamp_s, x, y, yaw) relative
    motions, integrated by the caller."""
    import csv

    rows = []
    with open(path) as f:
        reader = csv.DictReader(f)
        for r in reader:
            rows.append((
                float(r["destination_radar_timestamp"]) * 1e-6,
                float(r["x"]), float(r["y"]), float(r["yaw"]),
            ))
    return np.asarray(rows, np.float64)


def read_mulran_global_pose(path: str) -> np.ndarray:
    """MulRan ``global_pose.csv`` -> [N, 4] stamped planar world poses
    (stamp_s, x, y, yaw), rebased to the first pose.

    Format: nanosecond timestamp + the first 3 rows of the 4x4 world pose,
    row-major (13 columns).  The reference flattens GT to the plane and
    rebases to the first pose at ingestion (offline_odometry.cpp:80-96);
    same here: p_i' = T_0^{-1} * T_i restricted to SE(2).
    """
    raw = np.loadtxt(path, delimiter=",", dtype=np.float64)
    raw = np.atleast_2d(raw)
    stamps = raw[:, 0] * 1e-9
    m = raw[:, 1:13].reshape(-1, 3, 4)
    yaw = np.arctan2(m[:, 1, 0], m[:, 0, 0])
    x, y = m[:, 0, 3], m[:, 1, 3]
    # rebase: T0^{-1} compose
    c0, s0 = np.cos(yaw[0]), np.sin(yaw[0])
    dx, dy = x - x[0], y - y[0]
    xr = c0 * dx + s0 * dy
    yr = -s0 * dx + c0 * dy
    yawr = np.arctan2(np.sin(yaw - yaw[0]), np.cos(yaw - yaw[0]))
    return np.stack([stamps, xr, yr, yawr], -1)


def integrate_relative_gt(rel: np.ndarray) -> np.ndarray:
    """Compose [N, (stamp, dx, dy, dyaw)] into world poses [N+? , 4]
    (stamp, x, y, yaw) starting at the origin."""
    poses = [np.zeros(4)]
    x = y = th = 0.0
    for stamp, dx, dy, dyaw in rel:
        c, s = np.cos(th), np.sin(th)
        x += c * dx - s * dy
        y += s * dx + c * dy
        th = np.arctan2(np.sin(th + dyaw), np.cos(th + dyaw))
        poses.append(np.asarray([stamp, x, y, th]))
    return np.stack(poses)


class OxfordSequence:
    """Iterate an Oxford-layout sequence directory."""

    def __init__(self, root: str, flavor: str = "oxford"):
        self.root = root
        self.flavor = flavor
        radar_dir = os.path.join(root, "radar")
        if not os.path.isdir(radar_dir):
            # MulRan release layout
            mulran_dir = os.path.join(root, "sensor_data", "radar", "polar")
            radar_dir = mulran_dir if os.path.isdir(mulran_dir) else root
        self.files = _scan_files(radar_dir)
        if not self.files:
            raise FileNotFoundError(f"no radar pngs under {root}")
        self.gt: Optional[np.ndarray] = None  # [M, 4] stamped world poses
        gt_csv = os.path.join(root, "gt", "radar_odometry.csv")
        if os.path.exists(gt_csv):
            self.gt = integrate_relative_gt(read_radar_odometry_gt(gt_csv))
        else:
            # MulRan layout: global_pose.csv at the sequence root (or one
            # level up from sensor_data/radar/polar)
            for cand in (os.path.join(root, "global_pose.csv"),
                         os.path.join(root, "..", "global_pose.csv"),
                         os.path.join(root, "..", "..", "global_pose.csv")):
                if os.path.exists(cand):
                    self.gt = read_mulran_global_pose(cand)
                    break

    def __len__(self) -> int:
        return len(self.files)

    def _gt_at(self, stamp: float) -> Optional[np.ndarray]:
        if self.gt is None or len(self.gt) < 2:
            return None
        stamps = self.gt[:, 0]
        i = int(np.clip(np.searchsorted(stamps, stamp), 1, len(stamps) - 1))
        a, b = self.gt[i - 1], self.gt[i]
        f = 0.0 if b[0] == a[0] else (stamp - a[0]) / (b[0] - a[0])
        f = float(np.clip(f, 0.0, 1.0))
        dyaw = np.arctan2(np.sin(b[3] - a[3]), np.cos(b[3] - a[3]))
        return np.asarray([
            a[1] + (b[1] - a[1]) * f,
            a[2] + (b[2] - a[2]) * f,
            a[3] + dyaw * f,
        ])

    def __iter__(self) -> Iterator[RadarFrame]:
        # Prefer the native threaded decoder (io.native_loader) — libpng +
        # prefetch ring in C++; fall back to PIL per-file decode.
        try:
            from . import native_loader

            if native_loader.available() and self.flavor == "oxford":
                reader = native_loader.NativeSequenceReader(
                    self.files, strip_cols=OXFORD_META_COLUMNS)
                for img, stamp in reader:
                    yield RadarFrame(image=img, stamp=stamp,
                                     gt_pose=self._gt_at(stamp))
                reader.close()
                return
        except ImportError:
            pass
        for stamp, path in self.files:
            if self.flavor == "mulran":
                img = load_mulran_scan(path)
            else:
                img = load_oxford_scan(path)
            yield RadarFrame(image=img, stamp=stamp, gt_pose=self._gt_at(stamp))


def open_sequence(spec: str):
    """Open a dataset from a CLI spec:

    - ``sim:<frames>[:seed]`` — the synthetic simulator,
    - ``oxford:<dir>`` / ``mulran:<dir>`` — dataset directories.
    """
    kind, _, arg = spec.partition(":")
    if kind == "sim":
        from . import simulate

        parts = arg.split(":") if arg else []
        frames = int(parts[0]) if parts else 200
        seed = int(parts[1]) if len(parts) > 1 else 0
        seq = simulate.make_sequence(
            num_frames=frames, seed=seed,
            traj_kwargs=dict(radius=0.11 * frames, step=0.8, laps=1.25))
        frames_out = []
        g0 = seq.gt_poses[0]
        c, s = np.cos(g0[2]), np.sin(g0[2])
        for i in range(seq.images.shape[0]):
            g = seq.gt_poses[i]
            d = g[:2] - g0[:2]
            rel = np.asarray([c * d[0] + s * d[1], -s * d[0] + c * d[1],
                              np.arctan2(np.sin(g[2] - g0[2]),
                                         np.cos(g[2] - g0[2]))])
            frames_out.append(RadarFrame(image=seq.images[i], stamp=i * 0.25,
                                         gt_pose=rel))
        return frames_out, dict(num_azimuths=seq.num_azimuths,
                                num_range_bins=seq.num_range_bins,
                                range_res=seq.range_res)
    if kind in ("oxford", "mulran"):
        seq = OxfordSequence(arg, flavor=kind)
        meta = dict(num_azimuths=400,
                    num_range_bins=3768 if kind == "oxford" else 3360,
                    range_res=0.0438 if kind == "oxford" else 0.05952)
        return seq, meta
    raise ValueError(f"unknown dataset spec {spec!r}")
