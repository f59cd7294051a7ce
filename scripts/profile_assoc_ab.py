#!/usr/bin/env python
"""Interleaved A/B of the association pass: XLA broadcast-argmin, its
gather tail, and the packed one-hot MXU selection — same process,
alternating measurement windows so tunnel drift cancels.  (The r5 Pallas
fused-argmin kernel variant was measured here too — parity with XLA's own
fusion, recorded in artifacts/profile_wave_r5.md — and then removed.)"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

B, CS, CT = 128, 512, 512
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, CS, 2)) * 50, jnp.float32)
p = jnp.asarray(rng.standard_normal((B, CT, 2)) * 50, jnp.float32)
pv = jnp.asarray(rng.uniform(size=(B, CT)) > 0.2)
pn = jnp.asarray(rng.standard_normal((B, CT, 2)), jnp.float32)
pcv = jnp.asarray(rng.standard_normal((B, CT, 2, 2)), jnp.float32)
pns = jnp.asarray(rng.uniform(1, 20, (B, CT)), jnp.float32)
ppl = jnp.asarray(rng.uniform(size=(B, CT)), jnp.float32)


@jax.jit
def xla_argmin(qb, pb, pvb):
    def one(qq, pp_, vv):
        d2 = jnp.sum((qq[:, None, :] - pp_[None, :, :]) ** 2, -1)
        d2 = jnp.where(vv[None, :], d2, jnp.inf)
        nn = jnp.argmin(d2, axis=1)
        return nn, jnp.sum((qq - pp_[nn]) ** 2, -1)
    return jax.vmap(one)(qb, pb, pvb)


@jax.jit
def gather_tail(qb, nn, pb, pnb, pcvb, pnsb, pplb):
    def one(qq, ii, pp_, nb, cb, sb, lb):
        return (pp_[ii], nb[ii], cb[ii], sb[ii], lb[ii])
    outs = jax.vmap(one)(qb, nn, pb, pnb, pcvb, pnsb, pplb)
    return sum(jnp.sum(o) for o in outs)


def slope(fn, lo=8, hi=24, reps=3):
    e = fn(jnp.float32(0)); np.asarray(e)
    def total(k):
        best = float("inf")
        for _ in range(reps):
            ee = jnp.float32(0); t0 = time.perf_counter()
            for _ in range(k):
                ee = fn(ee)
            np.asarray(ee); best = min(best, time.perf_counter() - t0)
        return best
    return (total(hi) - total(lo)) / (hi - lo)


def f_xla(e):
    nn, d2 = xla_argmin(q + e, p, pv)
    return jnp.sum(d2) * 1e-20 + jnp.sum(nn).astype(jnp.float32) * 1e-20


@jax.jit
def xla_argmin_onehot(qb, pb, pvb, pnb, pcvb, pnsb, pplb):
    """Full association payload: fused argmin + ONE packed one-hot MXU
    contraction instead of 5 row gathers (gathers serialize on TPU)."""
    ct = pb.shape[1]

    def one(qq, pp_, vv, nb, cb, sb, lb):
        d2 = jnp.sum((qq[:, None, :] - pp_[None, :, :]) ** 2, -1)
        d2 = jnp.where(vv[None, :], d2, jnp.inf)
        nn = jnp.argmin(d2, axis=1)
        onehot = (jnp.arange(ct)[None, :] == nn[:, None]).astype(jnp.float32)
        packed = jnp.concatenate(
            [pp_, nb, sb[:, None], lb[:, None], vv[:, None].astype(jnp.float32),
             cb.reshape(ct, 4)], axis=-1)  # [Ct, 11]
        attrs = jnp.matmul(onehot, packed,
                           precision=jax.lax.Precision.HIGHEST)  # exact
        nn_d2 = jnp.sum((qq - attrs[:, :2]) ** 2, -1)
        return attrs, nn_d2

    a, d = jax.vmap(one)(qb, pb, pvb, pnb, pcvb, pnsb, pplb)
    return jnp.sum(a) * 1e-20 + jnp.sum(d) * 1e-20


def f_xla_full_gather(e):
    nn, d2 = xla_argmin(q + e, p, pv)
    s = gather_tail(q, nn, p, pn, pcv, pns, ppl)
    return jnp.sum(d2) * 1e-20 + s * 1e-20


def f_onehot(e):
    return xla_argmin_onehot(q + e, p, pv, pn, pcv, pns, ppl)


from statistics import median
rows = {"xla_argmin": f_xla,
        "xla+gathers": f_xla_full_gather,
        "xla+onehot_mxu": f_onehot}
vals = {k: [] for k in rows}
for _ in range(3):
    for k, fn in rows.items():
        vals[k].append(slope(fn))
for k in rows:
    print(f"{k:16s}: {median(vals[k])*1e3:7.3f} ms  "
          f"(runs: {[round(v*1e3,3) for v in vals[k]]})")
