"""Checkpoint / resume: the simple_graph + full_graph analogues.

The reference persists two stage checkpoints (SURVEY §5.4):

- ``simple_graph.sgh`` — odometry-stage output: every keyframe (pose, GT,
  filtered cloud, peaks cloud, CFEAR features) + odometry constraints, boost
  binary archive (types.h:192-196, Save/LoadSimpleGraph).  This split is the
  paper's main evaluation speedup: odometry runs once, SLAM variants re-run
  from the checkpoint.
- ``full_graph.pgh`` — the whole pose graph incl. loop constraints
  (posegraph.cpp:264-294).

Here both are single ``.npz`` archives of stacked SoA arrays — the padded
tensors are ALREADY the runtime format, so save/load is a straight
concatenation with no object graph walking.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import Cells, PointCloud


@dataclasses.dataclass
class SimpleGraph:
    """Odometry-stage checkpoint contents (keyframes + odometry constraints)."""

    kf_poses: np.ndarray  # [N, 3]
    kf_stamps: np.ndarray  # [N]
    kf_gt: Optional[np.ndarray]  # [N, 3] or None
    clouds: PointCloud  # stacked [N, P, ...] (numpy leaves)
    peaks: PointCloud  # stacked [N, P, ...]
    cells: Cells  # stacked [N, C, ...]
    constraints_idx: np.ndarray  # [E, 2] (id_begin, id_end)
    constraints_meas: np.ndarray  # [E, 3]
    constraints_cov: np.ndarray  # [E, 3, 3]

    @property
    def num_keyframes(self) -> int:
        return len(self.kf_poses)


def _stack(leaves: List) -> np.ndarray:
    return np.stack([np.asarray(x) for x in leaves])


def from_odometry(pipe) -> SimpleGraph:
    """Build the checkpoint from a finished OdometryPipeline."""
    cons = pipe.kf_constraints
    gt = getattr(pipe, "kf_gt", None)
    return SimpleGraph(
        kf_poses=_stack(pipe.kf_poses),
        kf_stamps=np.asarray(pipe.kf_stamps, np.float64),
        kf_gt=None if not gt else _stack(gt),
        clouds=jax.tree.map(lambda *x: _stack(x), *pipe.kf_clouds),
        peaks=jax.tree.map(lambda *x: _stack(x), *pipe.kf_peaks),
        cells=jax.tree.map(lambda *x: _stack(x), *pipe.kf_cells),
        constraints_idx=np.asarray(
            [[c["id_begin"], c["id_end"]] for c in cons],
            np.int32).reshape(-1, 2),
        constraints_meas=np.asarray([c["t_be"] for c in cons],
                                    np.float32).reshape(-1, 3),
        constraints_cov=np.asarray([c["cov"] for c in cons],
                                   np.float32).reshape(-1, 3, 3),
    )


def save_simple_graph(path: str, g: SimpleGraph) -> None:
    data = dict(
        kf_poses=g.kf_poses, kf_stamps=g.kf_stamps,
        cloud_xy=np.asarray(g.clouds.xy),
        cloud_intensity=np.asarray(g.clouds.intensity),
        cloud_mask=np.asarray(g.clouds.mask),
        peaks_xy=np.asarray(g.peaks.xy),
        peaks_intensity=np.asarray(g.peaks.intensity),
        peaks_mask=np.asarray(g.peaks.mask),
        cells_mean=np.asarray(g.cells.mean),
        cells_cov=np.asarray(g.cells.cov),
        cells_normal=np.asarray(g.cells.normal),
        cells_nsamples=np.asarray(g.cells.nsamples),
        cells_planarity=np.asarray(g.cells.planarity),
        cells_avg_intensity=np.asarray(g.cells.avg_intensity),
        cells_valid=np.asarray(g.cells.valid),
        constraints_idx=g.constraints_idx,
        constraints_meas=g.constraints_meas,
        constraints_cov=g.constraints_cov,
    )
    if g.kf_gt is not None:
        data["kf_gt"] = g.kf_gt
    np.savez_compressed(path, **data)


def load_simple_graph(path: str) -> SimpleGraph:
    z = np.load(path)
    clouds = PointCloud(xy=z["cloud_xy"], intensity=z["cloud_intensity"],
                        mask=z["cloud_mask"])
    peaks = PointCloud(xy=z["peaks_xy"], intensity=z["peaks_intensity"],
                       mask=z["peaks_mask"])
    cells = Cells(mean=z["cells_mean"], cov=z["cells_cov"],
                  normal=z["cells_normal"], nsamples=z["cells_nsamples"],
                  planarity=z["cells_planarity"],
                  avg_intensity=z["cells_avg_intensity"],
                  valid=z["cells_valid"])
    return SimpleGraph(
        kf_poses=z["kf_poses"], kf_stamps=z["kf_stamps"],
        kf_gt=z["kf_gt"] if "kf_gt" in z.files else None,
        clouds=clouds, peaks=peaks, cells=cells,
        constraints_idx=z["constraints_idx"],
        constraints_meas=z["constraints_meas"],
        constraints_cov=z["constraints_cov"],
    )


def save_full_graph(path: str, graph, loop_log: Optional[List[dict]] = None
                    ) -> None:
    """full_graph.pgh analogue: the PoseGraph (models.slam.PoseGraph) with
    ALL constraints incl. loops (posegraph.cpp:264-294)."""
    e = graph.edges
    data = dict(
        poses=np.stack(graph.poses) if graph.poses else np.zeros((0, 3)),
        stamps=np.asarray(graph.stamps, np.float64),
        edge_idx=np.asarray([ed["idx"] for ed in e], np.int32).reshape(-1, 2),
        edge_meas=np.asarray([ed["meas"] for ed in e],
                             np.float32).reshape(-1, 3),
        edge_type=np.asarray([ed["etype"] for ed in e], np.int32),
    )
    gt = graph.gt_array()
    if gt is not None:
        data["gt"] = gt
    np.savez_compressed(path, **data)


def load_full_graph(path: str, cfg):
    """Rebuild a models.slam.PoseGraph from a full-graph checkpoint."""
    from ..models.slam import PoseGraph

    z = np.load(path)
    g = PoseGraph(cfg)
    gt = z["gt"] if "gt" in z.files else None
    for i, p in enumerate(z["poses"]):
        g.add_node(p, float(z["stamps"][i]),
                   gt=None if gt is None else gt[i])
    for idx, meas, et in zip(z["edge_idx"], z["edge_meas"], z["edge_type"]):
        g.edges.append(dict(idx=(int(idx[0]), int(idx[1])),
                            meas=np.asarray(meas, np.float32),
                            etype=int(et)))
    return g
