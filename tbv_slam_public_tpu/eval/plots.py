"""Evaluation plots (matplotlib, Agg backend).

Rebuilds the reference's plotting layer: trajectory figures
(evaluation/2_plot_trajectory, Fig 5-6), loop-closure PR/ROC curves
(evaluation/3_loop_closure, Fig 4) and segment-error plots
(kitti_odometry.py plot_error).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def plot_trajectories(path: str, trajs: Dict[str, np.ndarray],
                      title: str = "", align_to: Optional[str] = "gt") -> None:
    """XY trajectory overlay; keys are labels ('gt', 'est', 'odom', ...)."""
    from . import trajectory as tj

    fig, ax = plt.subplots(figsize=(6, 6))
    ref = trajs.get(align_to) if align_to else None
    for label, p in trajs.items():
        xy = p[:, :2]
        if ref is not None and label != align_to and len(p) == len(ref):
            xy = tj.align_trajectory(p, ref)
        style = dict(lw=1.2)
        if label == "gt":
            style.update(color="black", ls="--", lw=1.0)
        ax.plot(xy[:, 0], xy[:, 1], label=label, **style)
    ax.set_aspect("equal")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.legend()
    if title:
        ax.set_title(title)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, bbox_inches="tight", dpi=120)
    plt.close(fig)


def plot_pr_curves(path: str, curves: Dict[str, tuple],
                   title: str = "Loop closure PR") -> None:
    """curves: label -> (precision [K], recall [K])."""
    fig, ax = plt.subplots(figsize=(5, 4))
    for label, (p, r) in curves.items():
        order = np.argsort(r)
        ax.plot(np.asarray(r)[order], np.asarray(p)[order], label=label)
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.set_xlim(0, 1.02)
    ax.set_ylim(0, 1.02)
    ax.legend()
    ax.set_title(title)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, bbox_inches="tight", dpi=120)
    plt.close(fig)


def plot_segment_errors(path: str, lengths: Sequence[float],
                        trans_pct: Sequence[float],
                        rot_deg: Sequence[float]) -> None:
    """Error-vs-segment-length bars (kitti_odometry plot_error analogue)."""
    fig, axes = plt.subplots(1, 2, figsize=(9, 3.5))
    axes[0].plot(lengths, trans_pct, "o-")
    axes[0].set_xlabel("Segment length [m]")
    axes[0].set_ylabel("Translation error [%]")
    axes[1].plot(lengths, rot_deg, "o-")
    axes[1].set_xlabel("Segment length [m]")
    axes[1].set_ylabel("Rotation error [deg/100m]")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, bbox_inches="tight", dpi=120)
    plt.close(fig)
