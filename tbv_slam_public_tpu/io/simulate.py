"""Synthetic radar world + scan simulator.

The reference consumes recorded rosbags; this repo has no dataset on disk, so
tests, benchmarks and end-to-end demos use a simulated world: scatterers along
random wall segments (giving CFEAR features meaningful surface normals), a
smooth closed-loop trajectory, and a polar-image renderer that reproduces the
reference's bin conventions (theta = 2*pi*(a+1)/A, r = res*(bin+0.5)) so the
whole preprocessing stack is exercised bit-for-bit like real data would.

Host-side NumPy: this is a data source, not a TPU code path.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass
class SimWorld:
    points: np.ndarray  # [M, 2] scatterer positions (world frame)
    reflectivity: np.ndarray  # [M] in (0, 1]


def make_world(rng: np.random.Generator, num_walls: int = 60,
               extent: float = 80.0, points_per_meter: float = 3.0) -> SimWorld:
    """Random wall segments densely sampled into scatterers."""
    pts = []
    for _ in range(num_walls):
        start = rng.uniform(-extent, extent, size=2)
        ang = rng.uniform(0, 2 * np.pi)
        length = rng.uniform(8.0, 35.0)
        n = max(int(length * points_per_meter), 2)
        t = np.linspace(0, length, n)
        seg = start + t[:, None] * np.array([np.cos(ang), np.sin(ang)])
        seg = seg + rng.normal(scale=0.03, size=seg.shape)
        pts.append(seg)
    points = np.concatenate(pts, axis=0)
    reflectivity = rng.uniform(0.4, 1.0, size=points.shape[0])
    return SimWorld(points=points.astype(np.float64), reflectivity=reflectivity)


def loop_trajectory(num_frames: int, *, radius: float = 60.0,
                    step: float = 0.9, laps: float = 1.15,
                    noise: float = 0.0,
                    rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Closed circular loop revisiting its start: [N, 3] (x, y, yaw) poses.

    ``laps`` > 1 revisits the loop start, producing true loop closures.
    """
    total_angle = 2 * np.pi * laps
    # arc length per frame ~ step
    dtheta = step / radius
    n = num_frames
    angles = np.arange(n) * dtheta
    angles = angles * (total_angle / max(angles[-1], 1e-9)) if angles[-1] > total_angle else angles
    x = radius * np.cos(angles) - radius
    y = radius * np.sin(angles)
    yaw = angles + np.pi / 2  # heading along the tangent
    traj = np.stack([x, y, np.arctan2(np.sin(yaw), np.cos(yaw))], axis=1)
    if noise and rng is not None:
        traj[:, :2] += rng.normal(scale=noise, size=(n, 2))
    return traj


def render_scan(world: SimWorld, pose: np.ndarray, *, num_azimuths: int = 400,
                num_range_bins: int = 512, range_res: float = 0.2,
                peak_intensity: float = 180.0, noise_floor: float = 25.0,
                rng: Optional[np.random.Generator] = None,
                beam_spread: int = 1) -> np.ndarray:
    """Render the polar image [A, R] (uint8) seen from ``pose``.

    Scatterers deposit a small range-axis intensity kernel at their
    (azimuth, range) bin; background is low-level noise below the z_min=60
    gate.  Inverse of the reference bin->point mapping
    (radar_filters.cpp:316-331).
    """
    a_count, r_count = num_azimuths, num_range_bins
    c, s = np.cos(pose[2]), np.sin(pose[2])
    rel = world.points - pose[:2]
    # world -> sensor frame
    px = c * rel[:, 0] + s * rel[:, 1]
    py = -s * rel[:, 0] + c * rel[:, 1]
    r = np.hypot(px, py)
    ang = np.mod(np.arctan2(py, px), 2 * np.pi)
    # theta = 2*pi*(a+1)/A  =>  a = round(theta*A/(2*pi) - 1) mod A
    a_idx = np.mod(np.round(ang * a_count / (2 * np.pi) - 1).astype(int), a_count)
    r_idx = np.round(r / range_res - 0.5).astype(int)
    keep = (r_idx >= 2) & (r_idx < r_count - 2)

    img = np.zeros((a_count, r_count), np.float32)
    # distance attenuation keeps far returns above z_min but weaker
    atten = 1.0 / (1.0 + r / (r_count * range_res))
    amp = peak_intensity * world.reflectivity * atten
    kernel = [(0, 1.0)]
    for d in range(1, beam_spread + 1):
        kernel += [(-d, 0.45 / d), (d, 0.45 / d)]
    for off, w in kernel:
        np.add.at(img, (a_idx[keep], np.clip(r_idx[keep] + off, 0, r_count - 1)),
                  amp[keep] * w)
    if rng is not None:
        img += rng.normal(loc=noise_floor, scale=6.0, size=img.shape)
    else:
        img += noise_floor
    return np.clip(img, 0, 255).astype(np.uint8)


@dataclasses.dataclass
class SimSequence:
    """A rendered sequence: polar images + ground-truth poses."""

    images: np.ndarray  # [N, A, R] uint8
    gt_poses: np.ndarray  # [N, 3]
    range_res: float
    num_azimuths: int
    num_range_bins: int


def make_sequence(num_frames: int = 60, seed: int = 0, *, num_azimuths: int = 400,
                  num_range_bins: int = 512, range_res: float = 0.2,
                  traj_kwargs: Optional[dict] = None) -> SimSequence:
    rng = np.random.default_rng(seed)
    world = make_world(rng)
    traj = loop_trajectory(num_frames, **(traj_kwargs or {}))
    imgs = np.stack([
        render_scan(world, traj[i], num_azimuths=num_azimuths,
                    num_range_bins=num_range_bins, range_res=range_res, rng=rng)
        for i in range(num_frames)
    ])
    return SimSequence(images=imgs, gt_poses=traj, range_res=range_res,
                       num_azimuths=num_azimuths, num_range_bins=num_range_bins)
