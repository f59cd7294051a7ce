"""Logistic regression: fit (penalized IRLS) + inference in JAX.

Replaces the reference's pybind11-embedded sklearn bridge
(alignmentinterface.cpp:188-279): sklearn LogisticRegression
(class_weight="balanced", C=1, max_iter=1000) becomes a Newton/IRLS solve on
device; ``predict_linear`` mirrors the reference's native re-implementation of
the fitted coefficients (coef . x + intercept, alignmentinterface.cpp:255-263).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class LogisticModel(NamedTuple):
    intercept: jnp.ndarray  # []
    coef: jnp.ndarray  # [D]


def predict_linear(model: LogisticModel, x: jnp.ndarray) -> jnp.ndarray:
    """Raw decision value coef . x + intercept for [..., D] inputs."""
    return x @ model.coef + model.intercept


def predict_proba(model: LogisticModel, x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.sigmoid(predict_linear(model, x))


def predict(model: LogisticModel, x: jnp.ndarray) -> jnp.ndarray:
    return predict_proba(model, x) > 0.5


@partial(jax.jit, static_argnames=("iterations", "balanced"))
def fit(
    x: jnp.ndarray,  # [N, D]
    y: jnp.ndarray,  # [N] in {0, 1}
    sample_mask: jnp.ndarray = None,  # [N] bool
    *,
    c: float = 1.0,
    iterations: int = 50,
    balanced: bool = True,
) -> LogisticModel:
    """Penalized IRLS fit of sigma(w.x + b).

    Matches sklearn's objective: minimize sum_i s_i * logloss_i +
    0.5/C * |w|^2 (intercept unpenalized); class weights "balanced" =
    n_samples / (2 * n_class) per sklearn's formula.
    """
    n, d = x.shape
    if sample_mask is None:
        sample_mask = jnp.ones((n,), bool)
    fm = sample_mask.astype(x.dtype)
    y = y.astype(x.dtype)
    n_eff = jnp.sum(fm)
    if balanced:
        n_pos = jnp.sum(fm * y)
        n_neg = n_eff - n_pos
        w_pos = n_eff / (2.0 * jnp.maximum(n_pos, 1.0))
        w_neg = n_eff / (2.0 * jnp.maximum(n_neg, 1.0))
        sw = jnp.where(y > 0.5, w_pos, w_neg) * fm
    else:
        sw = fm

    xb = jnp.concatenate([jnp.ones((n, 1), x.dtype), x], axis=1)  # [N, D+1]
    reg = jnp.concatenate([jnp.zeros((1,), x.dtype),
                           jnp.full((d,), 1.0 / c, x.dtype)])

    def newton_step(_, w):
        z = xb @ w
        p = jax.nn.sigmoid(z)
        g = xb.T @ (sw * (p - y)) + reg * w
        r = jnp.clip(sw * p * (1.0 - p), 1e-8, None)
        h = (xb * r[:, None]).T @ xb + jnp.diag(reg) + 1e-8 * jnp.eye(d + 1)
        step = jnp.linalg.solve(h, g)
        # damped Newton keeps early iterations stable on separable data
        return w - jnp.clip(step, -10.0, 10.0)

    w = jax.lax.fori_loop(0, iterations, newton_step,
                          jnp.zeros((d + 1,), x.dtype))
    return LogisticModel(intercept=w[0], coef=w[1:])


def accuracy(model: LogisticModel, x, y, mask=None) -> jnp.ndarray:
    pred = predict(model, x)
    ok = pred == (y > 0.5)
    if mask is not None:
        return jnp.sum(ok & mask) / jnp.maximum(jnp.sum(mask), 1)
    return jnp.mean(ok.astype(jnp.float32))


def confusion(model: LogisticModel, x, y, mask=None):
    """(tp, fp, tn, fn) counts."""
    pred = predict(model, x)
    truth = y > 0.5
    if mask is None:
        mask = jnp.ones_like(truth)
    tp = jnp.sum(pred & truth & mask)
    fp = jnp.sum(pred & ~truth & mask)
    tn = jnp.sum(~pred & ~truth & mask)
    fn = jnp.sum(~pred & truth & mask)
    return tp, fp, tn, fn


def roc_curve(model: LogisticModel, x, y, mask=None, thresholds=101):
    """(fpr, tpr) arrays over evenly spaced probability thresholds."""
    p = predict_proba(model, x)
    truth = np.asarray(y) > 0.5
    m = np.ones_like(truth) if mask is None else np.asarray(mask)
    p = np.asarray(p)
    ts = np.linspace(0, 1, thresholds)
    tpr, fpr = [], []
    pos = np.sum(truth & m)
    neg = np.sum(~truth & m)
    for t in ts:
        pred = (p >= t) & m
        tpr.append(np.sum(pred & truth) / max(pos, 1))
        fpr.append(np.sum(pred & ~truth) / max(neg, 1))
    return np.asarray(fpr), np.asarray(tpr)


def save_coefficients(model: LogisticModel, path: str) -> None:
    """CSV row: intercept, coef... (format of
    model_parameters/trained_*_classifier.txt)."""
    vals = [float(model.intercept)] + [float(v) for v in np.asarray(model.coef)]
    with open(path, "w") as f:
        f.write(",".join(f"{v:.6g}" for v in vals) + "\n")


def load_coefficients(path: str) -> LogisticModel:
    row = np.loadtxt(path, delimiter=",", ndmin=1)
    return LogisticModel(intercept=jnp.asarray(row[0], jnp.float32),
                         coef=jnp.asarray(row[1:], jnp.float32))


def from_values(intercept: float, coef) -> LogisticModel:
    return LogisticModel(intercept=jnp.asarray(intercept, jnp.float32),
                         coef=jnp.asarray(np.asarray(coef, np.float32)))
