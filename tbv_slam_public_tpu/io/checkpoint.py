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


def save_full_graph(path: str, graph, loop_log: Optional[List[dict]] = None,
                    slam=None) -> None:
    """full_graph.pgh analogue: the PoseGraph (models.slam.PoseGraph) with
    ALL constraints incl. loops (posegraph.cpp:264-294).

    When ``slam`` (a models.slam.TBVSLAM) is given, the keyframe SCAN
    PAYLOADS (verification peaks + CFEAR cells held by the LoopCloser) are
    stored too — the reference's full_graph.pgh retains every RadarScan, so
    loop closure / re-verification can RESUME from the checkpoint, not just
    re-optimize (VERDICT r1 #9).
    """
    e = graph.edges
    eye = np.eye(3, dtype=np.float32)
    data = dict(
        poses=np.stack(graph.poses) if graph.poses else np.zeros((0, 3)),
        stamps=np.asarray(graph.stamps, np.float64),
        edge_idx=np.asarray([ed["idx"] for ed in e], np.int32).reshape(-1, 2),
        edge_meas=np.asarray([ed["meas"] for ed in e],
                             np.float32).reshape(-1, 3),
        edge_type=np.asarray([ed["etype"] for ed in e], np.int32),
        edge_cov=np.asarray([eye if ed.get("cov") is None else ed["cov"]
                             for ed in e], np.float32).reshape(-1, 3, 3),
        edge_has_cov=np.asarray([ed.get("cov") is not None for ed in e],
                                bool),
    )
    gt = graph.gt_array()
    if gt is not None:
        data["gt"] = gt
    if slam is not None and slam.loops.kf_peaks:
        lp = slam.loops
        data.update(
            peaks_xy=_stack([p.xy for p in lp.kf_peaks]),
            peaks_intensity=_stack([p.intensity for p in lp.kf_peaks]),
            peaks_mask=_stack([p.mask for p in lp.kf_peaks]),
            cells_mean=_stack([c.mean for c in lp.kf_cells]),
            cells_cov=_stack([c.cov for c in lp.kf_cells]),
            cells_normal=_stack([c.normal for c in lp.kf_cells]),
            cells_nsamples=_stack([c.nsamples for c in lp.kf_cells]),
            cells_planarity=_stack([c.planarity for c in lp.kf_cells]),
            cells_avg_intensity=_stack(
                [c.avg_intensity for c in lp.kf_cells]),
            cells_valid=_stack([c.valid for c in lp.kf_cells]),
            kf_odom=_stack(lp.kf_odom),
        )
    np.savez_compressed(path, **data)


def load_full_graph(path: str, cfg):
    """Rebuild a models.slam.PoseGraph from a full-graph checkpoint."""
    from ..models.slam import PoseGraph

    z = np.load(path)
    g = PoseGraph(cfg)
    gt = z["gt"] if "gt" in z.files else None
    has_cov = z["edge_has_cov"] if "edge_has_cov" in z.files else None
    covs = z["edge_cov"] if "edge_cov" in z.files else None
    for i, p in enumerate(z["poses"]):
        g.add_node(p, float(z["stamps"][i]),
                   gt=None if gt is None else gt[i])
    for k, (idx, meas, et) in enumerate(zip(z["edge_idx"], z["edge_meas"],
                                            z["edge_type"])):
        cov = covs[k] if covs is not None and has_cov is not None \
            and has_cov[k] else None
        g.edges.append(dict(idx=(int(idx[0]), int(idx[1])),
                            meas=np.asarray(meas, np.float32),
                            etype=int(et), cov=cov))
    return g


def load_full_graph_slam(path: str, cfg):
    """Rebuild a full TBVSLAM — pose graph AND loop-closer keyframe payloads
    — from a full-graph checkpoint saved with ``slam=``.  Returns the TBVSLAM
    with loop closure resumable (processed pointer at the end: call
    loops.process_all_batched()/process_pending() after adding more
    keyframes, or re-verify existing constraints)."""
    from ..core.types import Cells, PointCloud
    from ..models.slam import TBVSLAM

    z = np.load(path)
    if "peaks_xy" not in z.files:
        raise ValueError(f"{path} was saved without scan payloads "
                         "(save_full_graph(..., slam=...))")
    slam = TBVSLAM(cfg)
    slam.graph = load_full_graph(path, cfg)
    n = slam.graph.num_nodes
    for i in range(n):
        peaks = PointCloud(xy=z["peaks_xy"][i],
                           intensity=z["peaks_intensity"][i],
                           mask=z["peaks_mask"][i])
        cells = Cells(mean=z["cells_mean"][i], cov=z["cells_cov"][i],
                      normal=z["cells_normal"][i],
                      nsamples=z["cells_nsamples"][i],
                      planarity=z["cells_planarity"][i],
                      avg_intensity=z["cells_avg_intensity"][i],
                      valid=z["cells_valid"][i])
        slam.loops.add_keyframe(peaks, cells, z["kf_odom"][i])
    slam.loops._processed = n
    slam._kf_to_node = list(range(n))
    return slam
