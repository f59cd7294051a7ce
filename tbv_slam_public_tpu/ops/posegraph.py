"""Pose-graph optimization as batched SE(2) Gauss-Newton / LM.

TPU-native replacement for the reference's Ceres pose-graph solver
(tbv_slam/src/tbv_slam/ceresoptimizer.cpp:13-110): the per-edge
PoseGraph3dErrorTerm residual (ceresoptimizer.h:51-95) becomes one batched
computation over a padded SoA edge store, and SPARSE_NORMAL_CHOLESKY
(ceresoptimizer.cpp:56) becomes either

- a dense blocked normal-equation solve (``solver="cholesky"``): the Hessian
  of the 3N-DoF planar graph is assembled with two batched 3x3-block
  scatter-adds and factorized on the MXU — for the graph sizes of this system
  (~1-2k keyframes) a dense 3Nx3N Cholesky is far below a millisecond-scale
  TPU matmul and beats the reference's 980 ms sparse CPU solve outright, or
- a matrix-free block-Jacobi preconditioned conjugate-gradient solve
  (``solver="cg"``): Hv products are computed edge-wise with segment-sums —
  this is the form that shards across chips (edges partitioned, psum over the
  mesh; see tbv_slam_public_tpu.parallel).

Robustification follows the reference: odometry edges take no loss, loop
edges a Cauchy(0.1) loss applied by IRLS reweighting
(ceresoptimizer.cpp:34-35); with ``replace_cov_by_identity`` the information
is diag(1/0.01, 1/0.01, 1/0.001) and loop edges are additionally divided by
``loop_scaling`` (ceresoptimizer.cpp:83-100).  The first pose is gauge-fixed
(ceresoptimizer.cpp:58 SetParameterBlockConstant analogue).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core import se2
from ..core.config import PGOConfig
from ..core.types import ODOMETRY, GraphEdges


class PGOResult(NamedTuple):
    poses: jnp.ndarray  # [N, 3] optimized
    cost0: jnp.ndarray  # [] initial cost
    cost: jnp.ndarray  # [] final cost
    iterations: jnp.ndarray  # [] int32 accepted LM iterations


def default_sqrt_info(etype: jnp.ndarray, cfg: PGOConfig) -> jnp.ndarray:
    """Per-edge diagonal sqrt-information under replace_cov_by_identity.

    Reference: covariance diag(0.01, 0.01, 0.001); loop information divided by
    loop_scaling (ceresoptimizer.cpp:83-100).
    """
    base = jnp.sqrt(jnp.asarray(
        [1.0 / cfg.odom_vxx, 1.0 / cfg.odom_vyy, 1.0 / cfg.odom_vtt],
        jnp.float32))
    scale = jnp.where(etype == ODOMETRY, 1.0,
                      1.0 / jnp.sqrt(cfg.loop_scaling)).astype(jnp.float32)
    return scale[:, None] * base[None, :]


def _edge_residuals(poses: jnp.ndarray, edges: GraphEdges):
    """Whitened residuals r [E,3] and the raw geometry terms used by jacobians.

    r = sqrt_info * [R(th_b)^T (p_e - p_b) - t_be ; wrap(th_e - th_b - th_be)]
    (PoseGraph3dErrorTerm, ceresoptimizer.h:61-95, restricted to the plane).
    """
    pb = poses[edges.idx[:, 0]]  # [E, 3]
    pe = poses[edges.idx[:, 1]]
    c, s = jnp.cos(pb[:, 2]), jnp.sin(pb[:, 2])
    dx = pe[:, 0] - pb[:, 0]
    dy = pe[:, 1] - pb[:, 1]
    # R^T d
    rx = c * dx + s * dy
    ry = -s * dx + c * dy
    rtheta = se2.wrap_angle(pe[:, 2] - pb[:, 2] - edges.meas[:, 2])
    raw = jnp.stack([rx - edges.meas[:, 0], ry - edges.meas[:, 1], rtheta], -1)
    r = edges.sqrt_info * raw
    return r, (c, s, dx, dy)


def _edge_jacobians(poses: jnp.ndarray, edges: GraphEdges):
    """Whitened jacobian blocks Jb, Je [E, 3, 3] wrt (x, y, theta) of b and e."""
    r, (c, s, dx, dy) = _edge_residuals(poses, edges)
    zeros = jnp.zeros_like(c)
    ones = jnp.ones_like(c)
    # d(R^T d)/d p_b = -R^T ; d(R^T d)/d th_b = dR^T/dth d
    Jb = jnp.stack([
        jnp.stack([-c, -s, -s * dx + c * dy], -1),
        jnp.stack([s, -c, -c * dx - s * dy], -1),
        jnp.stack([zeros, zeros, -ones], -1),
    ], axis=-2)  # [E, 3, 3]
    Je = jnp.stack([
        jnp.stack([c, s, zeros], -1),
        jnp.stack([-s, c, zeros], -1),
        jnp.stack([zeros, zeros, ones], -1),
    ], axis=-2)
    w = edges.sqrt_info[..., None]  # whitening rows
    return r, Jb * w, Je * w


def _cauchy_weights(r: jnp.ndarray, edges: GraphEdges, cfg: PGOConfig):
    """Per-edge (rho(s), IRLS weight): Cauchy(0.1) on loops, none on odometry
    (ceresoptimizer.cpp:34-35)."""
    s = jnp.sum(r * r, axis=-1)
    b = cfg.cauchy_scale * cfg.cauchy_scale
    rho_c = b * jnp.log1p(s / b)
    w_c = 1.0 / (1.0 + s / b)
    is_odom = edges.etype == ODOMETRY
    rho = jnp.where(is_odom, s, rho_c)
    w = jnp.where(is_odom, 1.0, w_c)
    w = jnp.where(edges.mask, w, 0.0)
    rho = jnp.where(edges.mask, rho, 0.0)
    return rho, w


def graph_cost(poses: jnp.ndarray, edges: GraphEdges, cfg: PGOConfig):
    r, _ = _edge_residuals(poses, edges)
    rho, _ = _cauchy_weights(r, edges, cfg)
    return 0.5 * jnp.sum(rho)


def _incidence(edges: GraphEdges, n: int, dtype):
    """One-hot begin/end incidence matrices [E, N] (masked edges zeroed).

    TPU-first detail: every edge->node reduction below is expressed as a
    matmul against these one-hots instead of a scatter-add — scatters
    serialize on TPU while [N,E]x[E,·] contractions run on the MXU.
    """
    cols = jnp.arange(n)
    m = edges.mask[:, None]
    ub = ((edges.idx[:, 0:1] == cols[None, :]) & m).astype(dtype)
    ue = ((edges.idx[:, 1:2] == cols[None, :]) & m).astype(dtype)
    return ub, ue


def _gradient_and_blocks(poses, edges, cfg: PGOConfig):
    """IRLS gradient [N,3] and the per-edge GN blocks for H."""
    r, Jb, Je = _edge_jacobians(poses, edges)
    rho, w = _cauchy_weights(r, edges, cfg)
    cost = 0.5 * jnp.sum(rho)
    wr = w[:, None] * r
    n = poses.shape[0]
    gb = jnp.einsum("eij,ei->ej", Jb, wr)
    ge = jnp.einsum("eij,ei->ej", Je, wr)
    ub, ue = _incidence(edges, n, poses.dtype)
    g = ub.T @ gb + ue.T @ ge
    we = w[:, None, None]
    Hbb = we * jnp.einsum("eri,erj->eij", Jb, Jb)
    Hee = we * jnp.einsum("eri,erj->eij", Je, Je)
    Hbe = we * jnp.einsum("eri,erj->eij", Jb, Je)
    return cost, g, (Hbb, Hee, Hbe)


def _dense_hessian(n, edges, blocks, gauge_mask):
    """Assemble the dense [3N,3N] Hessian from the 3x3 edge blocks.

    MXU form: block scatter-adds become one-hot einsum contractions over the
    edge axis (matmuls), which XLA tiles onto the systolic array.

    ``gauge_mask`` [N] bool marks FREE nodes; fixed/padded nodes get identity
    rows/cols so the factorization stays SPD without changing free DoFs.
    """
    Hbb, Hee, Hbe = blocks
    ub, ue = _incidence(edges, n, Hbb.dtype)
    H = (
        jnp.einsum("en,eij,em->nimj", ub, Hbb, ub)
        + jnp.einsum("en,eij,em->nimj", ue, Hee, ue)
        + jnp.einsum("en,eij,em->nimj", ub, Hbe, ue)
        + jnp.einsum("en,eji,em->nimj", ue, Hbe, ub)
    )
    H = H.reshape(3 * n, 3 * n)
    free = jnp.repeat(gauge_mask, 3)
    keep = free[:, None] & free[None, :]
    H = jnp.where(keep, H, 0.0)
    H = H + jnp.diag(jnp.where(free, 0.0, 1.0))
    return H


def _hvp(v, edges, w, Jb, Je, gauge_mask):
    """Matrix-free H v for the CG path; v [N,3] -> [N,3].

    Edge-wise: y_e = w * (Jb v_b + Je v_e); scatter Jb^T y, Je^T y.  Under
    shard_map the two scatter-adds become psum-reduced partial sums.
    """
    v = jnp.where(gauge_mask[:, None], v, 0.0)
    vb = v[edges.idx[:, 0]]
    ve = v[edges.idx[:, 1]]
    y = w[:, None] * (jnp.einsum("eij,ej->ei", Jb, vb)
                      + jnp.einsum("eij,ej->ei", Je, ve))
    out = jnp.zeros_like(v)
    out = out.at[edges.idx[:, 0]].add(jnp.einsum("eij,ei->ej", Jb, y))
    out = out.at[edges.idx[:, 1]].add(jnp.einsum("eij,ei->ej", Je, y))
    return jnp.where(gauge_mask[:, None], out, 0.0)


def _block_diag(n, edges, blocks, gauge_mask):
    Hbb, Hee, _ = blocks
    D = jnp.zeros((n, 3, 3), Hbb.dtype)
    D = D.at[edges.idx[:, 0]].add(Hbb)
    D = D.at[edges.idx[:, 1]].add(Hee)
    eye = jnp.eye(3, dtype=Hbb.dtype)
    return jnp.where(gauge_mask[:, None, None], D, eye[None])


def _pcg_solve(b, edges, w, Jb, Je, diag_blocks, gauge_mask, lam, iters, tol):
    """Block-Jacobi preconditioned CG on (H + lam*diag(H)) x = b."""
    lam_diag = lam * jnp.diagonal(diag_blocks, axis1=-2, axis2=-1)  # [N, 3]
    damp = (diag_blocks + jax.vmap(jnp.diag)(lam_diag)
            + 1e-9 * jnp.eye(3)[None])
    Minv = jnp.linalg.inv(damp)

    def A(v):
        return _hvp(v, edges, w, Jb, Je, gauge_mask) + lam_diag * v + 1e-9 * v

    def precond(v):
        return jnp.einsum("nij,nj->ni", Minv, v)

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)
    bnorm = jnp.sqrt(jnp.sum(b * b)) + 1e-30

    def body(_, state):
        x, r, p, rz, active = state
        Ap = A(p)
        denom = jnp.sum(p * Ap)
        alpha = jnp.where(denom > 0, rz / jnp.maximum(denom, 1e-30), 0.0)
        xn = x + alpha * p
        rn = r - alpha * Ap
        zn = precond(rn)
        rzn = jnp.sum(rn * zn)
        beta = rzn / jnp.maximum(rz, 1e-30)
        pn = zn + beta * p
        done = jnp.sqrt(jnp.sum(rn * rn)) < tol * bnorm
        keep = active & ~done & (denom > 0)
        pick = lambda a_new, a_old: jnp.where(active, a_new, a_old)
        return (pick(xn, x), pick(rn, r), pick(pn, p),
                jnp.where(active, rzn, rz), keep)

    x, *_ = jax.lax.fori_loop(
        0, iters, body, (x0, r0, p0, rz0, jnp.asarray(True)))
    return x


def _lago_initialize(poses, gauge_mask, edges: GraphEdges):
    """Two-stage linear initialization (LAGO-style, Carlone et al.):

    1. orientation: linear LS on angle corrections d (residual
       wrap(th_e - th_b - m) + d_e - d_b), a graph-Laplacian solve;
    2. position: with orientations fixed, p_e - p_b = R(th_b) m_xy is LINEAR
       in positions — a second Laplacian solve with 2 right-hand sides.

    Both Laplacians are assembled as one-hot matmuls (MXU) and factorized
    densely; the subsequent LM then starts near the basin and converges in a
    handful of iterations instead of tens.  Loop edges participate with
    their (heavily down-scaled, ceresoptimizer.cpp:83-100) weights, so a
    stray outlier cannot dominate the init.
    """
    n = poses.shape[0]
    ub, ue = _incidence(edges, n, poses.dtype)
    d_inc = ue - ub  # [E, N]
    free = gauge_mask.astype(poses.dtype)

    def laplacian_solve(w, rhs_edge):
        """Solve (d_inc^T W d_inc) x = d_inc^T (w * rhs_edge) with gauge."""
        lap = d_inc.T @ (w[:, None] * d_inc)  # [N, N]
        keep = free[:, None] * free[None, :]
        lap = lap * keep + jnp.diag(1.0 - free)
        rhs = d_inc.T @ (w[:, None] * rhs_edge) * free[:, None]
        cl = jax.scipy.linalg.cho_factor(lap + 1e-6 * jnp.eye(n))
        return jax.scipy.linalg.cho_solve(cl, rhs)

    # 1) orientations
    w_th = jnp.where(edges.mask, edges.sqrt_info[:, 2] ** 2, 0.0)
    pb = poses[edges.idx[:, 0]]
    pe = poses[edges.idx[:, 1]]
    r_th = se2.wrap_angle(pe[:, 2] - pb[:, 2] - edges.meas[:, 2])
    delta = laplacian_solve(w_th, -r_th[:, None])[:, 0]
    theta = se2.wrap_angle(poses[:, 2] + delta)

    # 2) positions given orientations
    c, s = jnp.cos(theta[edges.idx[:, 0]]), jnp.sin(theta[edges.idx[:, 0]])
    dx = c * edges.meas[:, 0] - s * edges.meas[:, 1]
    dy = s * edges.meas[:, 0] + c * edges.meas[:, 1]
    w_xy = jnp.where(edges.mask,
                     0.5 * (edges.sqrt_info[:, 0] ** 2
                            + edges.sqrt_info[:, 1] ** 2), 0.0)
    # residual (p_e - p_b) - d must also account for the FIXED node-0
    # position entering the rhs: fold p0 contributions in via the current p.
    cur = poses[:, :2]
    rhs = jnp.stack([dx, dy], -1) - (cur[edges.idx[:, 1]] - cur[edges.idx[:, 0]])
    dp = laplacian_solve(w_xy, rhs)
    p = cur + dp

    out = jnp.concatenate([p, theta[:, None]], axis=1)
    return jnp.where(gauge_mask[:, None], out, poses)


@partial(jax.jit, static_argnames=("cfg", "solver"))
def optimize(
    poses: jnp.ndarray,  # [N, 3]
    node_mask: jnp.ndarray,  # [N] bool
    edges: GraphEdges,
    cfg: PGOConfig,
    solver: str = "cholesky",
) -> PGOResult:
    """Robust LM over the whole pose graph; first valid pose gauge-fixed.

    Matches CeresLeastSquares::Solve semantics (ceresoptimizer.cpp:44-62):
    trust-region LM with accept/reject, up to cfg.max_iterations outer steps,
    converging on relative cost decrease.
    """
    n = poses.shape[0]
    gauge_mask = node_mask & (jnp.arange(n) != 0)

    cost0 = graph_cost(poses, edges, cfg)
    cur0 = cost0
    if cfg.lago_init:
        cand = _lago_initialize(poses, gauge_mask, edges)
        cand_cost = graph_cost(cand, edges, cfg)
        better = cand_cost < cost0
        poses = jnp.where(better, cand, poses)
        cur0 = jnp.where(better, cand_cost, cost0)

    def cond(state):
        _, _, _, _, itr, done = state
        return (itr < cfg.max_iterations) & ~done

    def body(state):
        p, lam, cur, accepted, itr, _ = state
        cost, g, blocks = _gradient_and_blocks(p, edges, cfg)
        if solver == "cholesky":
            # Tri-damping: the Hessian assembly dominates the iteration, so
            # amortize it over three trust-region radii solved as one
            # batched Cholesky; pick the best candidate.  Roughly halves the
            # iteration count of classic accept/reject LM.
            H = _dense_hessian(n, edges, blocks, gauge_mask)
            g_flat = jnp.where(jnp.repeat(gauge_mask, 3), g.reshape(-1), 0.0)
            lams = jnp.stack([0.1 * lam, lam, 10.0 * lam])
            hdiag = jnp.diagonal(H)

            def solve_one(l):
                hl = H + jnp.diag(l * hdiag) + 1e-9 * jnp.eye(3 * n)
                cl = jax.scipy.linalg.cho_factor(hl)
                s = -jax.scipy.linalg.cho_solve(cl, g_flat)
                c = p + s.reshape(n, 3)
                c = c.at[:, 2].set(se2.wrap_angle(c[:, 2]))
                c = jnp.where(gauge_mask[:, None], c, p)
                return c, graph_cost(c, edges, cfg)

            cands, costs = jax.vmap(solve_one)(lams)
            best = jnp.argmin(costs)
            cand = cands[best]
            new_cost = costs[best]
            lam_next = jnp.maximum(lams[best] * 0.5, 1e-12)
        else:
            r, Jb, Je = _edge_jacobians(p, edges)
            _, w = _cauchy_weights(r, edges, cfg)
            diag_blocks = _block_diag(n, edges, blocks, gauge_mask)
            gm = jnp.where(gauge_mask[:, None], g, 0.0)
            step = -_pcg_solve(gm, edges, w, Jb, Je, diag_blocks, gauge_mask,
                               lam, cfg.cg_iterations, cfg.cg_tol)
            step = jnp.where(gauge_mask[:, None], step, 0.0)
            cand = p + step
            cand = cand.at[:, 2].set(se2.wrap_angle(cand[:, 2]))
            new_cost = graph_cost(cand, edges, cfg)
            lam_next = jnp.maximum(lam * 0.5, 1e-12)
        accept = new_cost < cur
        # Ceres-style convergence: accepted step with tiny relative decrease
        rel_dec = (cur - new_cost) / jnp.maximum(cur, 1e-20)
        done = (accept & (rel_dec < cfg.function_tolerance)) | (lam > 1e7)
        p = jnp.where(accept, cand, p)
        lam = jnp.where(accept, lam_next, jnp.minimum(lam * 10.0, 1e8))
        cur = jnp.where(accept, new_cost, cur)
        accepted = accepted + accept.astype(jnp.int32)
        return p, lam, cur, accepted, itr + 1, done

    state = (poses, jnp.asarray(cfg.init_lambda, poses.dtype), cur0,
             jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
             jnp.asarray(False))
    p, _, cost, iters, _, _ = jax.lax.while_loop(cond, body, state)
    return PGOResult(poses=p, cost0=cost0, cost=cost, iterations=iters)


def make_edges(idx, meas, sqrt_info, etype, mask) -> GraphEdges:
    return GraphEdges(
        idx=jnp.asarray(idx, jnp.int32),
        meas=jnp.asarray(meas, jnp.float32),
        sqrt_info=jnp.asarray(sqrt_info, jnp.float32),
        etype=jnp.asarray(etype, jnp.int32),
        mask=jnp.asarray(mask, bool),
    )
