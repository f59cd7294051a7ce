"""Loop-closure candidate evaluation: GT labels, loop.csv, PR/ROC.

Parity with the reference's EvaluationManager + LoopClosureEval.py
(place_recognition_radar/src/.../EvaluationManager.cpp:12-60 and
python/LoopClosureEval.py):

- a candidate (from, to) IS a loop when the closest GT pose at least
  ``min_idx_separation`` keyframes away lies within ``loop_distance`` meters
  (getCandidateLoopStatus, EvaluationManager.cpp:12-27),
- a positive candidate is REGISTERED-OK when the GT-relative registration
  error is < 4 m and < 2.5 degrees,
- loop.csv rows carry the classifier features + labels; precision/recall/
  accuracy and PR/ROC curves are computed from (probability, is_loop) pairs.
"""
from __future__ import annotations

import dataclasses
import math
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def candidate_labels(gt_poses: np.ndarray, id_from: int, id_to: int,
                     t_be: np.ndarray, *, loop_distance: float = 6.0,
                     min_idx_separation: int = 10,
                     max_trans_err: float = 4.0,
                     max_rot_err_deg: float = 2.5) -> Tuple[bool, bool]:
    """(is_loop, registration_ok) for one candidate.

    EvaluationManager.cpp:12-27: is_loop from the distance to the closest GT
    pose >= min_idx_separation away; registration_ok from the GT relative
    pose vs the registered t_be.
    """
    n = len(gt_poses)
    idx = np.arange(n)
    far = np.abs(idx - id_from) >= min_idx_separation
    if not far.any():
        return False, False
    d = np.linalg.norm(gt_poses[:, :2] - gt_poses[id_from, :2], axis=1)
    is_loop = bool(np.min(d[far]) < loop_distance)

    a, b = gt_poses[id_from], gt_poses[id_to]
    c, s = np.cos(a[2]), np.sin(a[2])
    dx, dy = b[0] - a[0], b[1] - a[1]
    t_gt = np.array([c * dx + s * dy, -s * dx + c * dy,
                     math.atan2(math.sin(b[2] - a[2]), math.cos(b[2] - a[2]))])
    err_t = float(np.linalg.norm(t_be[:2] - t_gt[:2]))
    err_r = abs(math.atan2(math.sin(t_be[2] - t_gt[2]),
                           math.cos(t_be[2] - t_gt[2])))
    reg_ok = err_t < max_trans_err and err_r < math.radians(max_rot_err_deg)
    return is_loop, reg_ok


def label_candidate_log(candidate_log: List[dict],
                        gt_poses: np.ndarray) -> List[dict]:
    """Attach GT labels to the LoopCloser.candidate_log rows."""
    out = []
    for row in candidate_log:
        is_loop, reg_ok = candidate_labels(
            gt_poses, row["id_from"], row["id_to"],
            np.asarray(row["t_be"], np.float64))
        r = dict(row)
        r["is_loop"] = int(is_loop)
        r["registration_ok"] = int(reg_ok)
        out.append(r)
    return out


LOOP_CSV_COLUMNS = ("id_from", "id_to", "guess_nr", "prob", "odom_bounds",
                    "sc_sim", "alignment_quality", "is_loop",
                    "registration_ok")


def write_loop_csv(path: str, labeled_log: List[dict]) -> None:
    """CSV dump (writeResultsToCSV, EvaluationManager.cpp:29-60 analogue)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(",".join(LOOP_CSV_COLUMNS) + "\n")
        for row in labeled_log:
            f.write(",".join(str(row.get(c, "")) for c in LOOP_CSV_COLUMNS)
                    + "\n")


def read_loop_csv(path: str) -> List[dict]:
    with open(path) as f:
        header = f.readline().strip().split(",")
        rows = []
        for line in f:
            vals = line.strip().split(",")
            rows.append({k: float(v) if v else 0.0
                         for k, v in zip(header, vals)})
    return rows


@dataclasses.dataclass
class ClassifierMetrics:
    accuracy: float
    precision: float
    recall: float
    f1: float
    auc: float
    num_pos: int
    num_neg: int

    def as_dict(self) -> Dict[str, float]:
        return dataclasses.asdict(self)


def pr_curve(probs: np.ndarray, labels: np.ndarray,
             thresholds: Optional[np.ndarray] = None):
    """(thresholds, precision, recall) arrays."""
    if thresholds is None:
        thresholds = np.linspace(0.0, 1.0, 101)
    p, r = [], []
    pos = labels.sum()
    for t in thresholds:
        pred = probs > t
        tp = float(np.sum(pred & (labels > 0)))
        fp = float(np.sum(pred & (labels == 0)))
        p.append(tp / max(tp + fp, 1e-12))
        r.append(tp / max(pos, 1e-12))
    return thresholds, np.asarray(p), np.asarray(r)


def roc_auc(probs: np.ndarray, labels: np.ndarray) -> float:
    """AUC by the rank statistic (equivalent to the trapezoid ROC area)."""
    pos = probs[labels > 0]
    neg = probs[labels == 0]
    if len(pos) == 0 or len(neg) == 0:
        return 0.5
    order = np.argsort(np.concatenate([pos, neg]), kind="mergesort")
    ranks = np.empty(len(order))
    ranks[order] = np.arange(1, len(order) + 1)
    r_pos = ranks[: len(pos)].sum()
    u = r_pos - len(pos) * (len(pos) + 1) / 2.0
    return float(u / (len(pos) * len(neg)))


def classifier_metrics(probs: np.ndarray, labels: np.ndarray,
                       threshold: float = 0.5) -> ClassifierMetrics:
    pred = probs > threshold
    labels = labels > 0
    tp = float(np.sum(pred & labels))
    tn = float(np.sum(~pred & ~labels))
    fp = float(np.sum(pred & ~labels))
    fn = float(np.sum(~pred & labels))
    prec = tp / max(tp + fp, 1e-12)
    rec = tp / max(tp + fn, 1e-12)
    return ClassifierMetrics(
        accuracy=(tp + tn) / max(len(labels), 1),
        precision=prec, recall=rec,
        f1=2 * prec * rec / max(prec + rec, 1e-12),
        auc=roc_auc(probs, labels.astype(float)),
        num_pos=int(labels.sum()), num_neg=int((~labels).sum()),
    )


def write_result_txt(path: str, train: ClassifierMetrics,
                     test: Optional[ClassifierMetrics] = None) -> None:
    """loop/result.txt analogue (LoopClosureEval.py outputs)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("train-accuracy, {:.5f}\n".format(train.accuracy))
        f.write("train-precision, {:.5f}\n".format(train.precision))
        f.write("train-recall, {:.5f}\n".format(train.recall))
        t = test or train
        f.write("test-accuracy, {:.5f}\n".format(t.accuracy))
        f.write("test-precision, {:.5f}\n".format(t.precision))
        f.write("test-recall, {:.5f}\n".format(t.recall))
        f.write("auc, {:.5f}\n".format(t.auc))
