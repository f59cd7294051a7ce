#!/usr/bin/env python
"""Micro-benchmark: association NN forms at wave shapes [B, Cs, Ct]."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, C = int(sys.argv[1]) if len(sys.argv) > 1 else 64, 512
rng = np.random.default_rng(0)
src = jnp.asarray(rng.uniform(-100, 100, (B, C, 2)), jnp.float32)
tgt = jnp.asarray(rng.uniform(-100, 100, (B, C, 2)), jnp.float32)
valid = jnp.asarray(rng.uniform(size=(B, C)) > 0.3)


def slope(fn, lo=4, hi=16, reps=2):
    e = fn(jnp.float32(0)); np.asarray(e)
    def tot(k):
        best = np.inf
        for _ in range(reps):
            x = jnp.float32(0)
            t0 = time.perf_counter()
            for _ in range(k):
                x = fn(x)
            np.asarray(x)
            best = min(best, time.perf_counter() - t0)
        return best
    return (tot(hi) - tot(lo)) / (hi - lo)


@jax.jit
def matmul_form(eps):
    s = src + eps
    def one(a, b, v):
        d2 = (jnp.sum(a * a, 1)[:, None] + jnp.sum(b * b, 1)[None, :]
              - 2.0 * jnp.matmul(a, b.T, precision=jax.lax.Precision.HIGHEST))
        d2 = jnp.where(v[None, :], d2, jnp.inf)
        nn = jnp.argmin(d2, axis=1)
        nn_d2 = jnp.take_along_axis(d2, nn[:, None], axis=1)[:, 0]
        return nn, nn_d2
    nn, d = jax.vmap(one)(s, tgt, valid)
    return (jnp.sum(d.astype(jnp.float32)) + jnp.sum(nn)) * 1e-30


@jax.jit
def fused_form(eps):
    s = src + eps
    def one(a, b, v):
        d2 = jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, -1)
        d2 = jnp.where(v[None, :], d2, jnp.inf)
        nn = jnp.argmin(d2, axis=1)
        nn_d2 = jnp.sum((a - b[nn]) ** 2, -1)
        nn_d2 = jnp.where(v[nn], nn_d2, jnp.inf)
        return nn, nn_d2
    nn, d = jax.vmap(one)(s, tgt, valid)
    return (jnp.sum(d.astype(jnp.float32)) + jnp.sum(nn)) * 1e-30


for name, fn in (("matmul", matmul_form), ("fused", fused_form)):
    t = slope(fn)
    print(f"{name:8s} B={B} C={C}: {t*1e3:7.3f} ms", flush=True)

# correctness cross-check
n1 = np.asarray(jax.jit(lambda: jax.vmap(
    lambda a, b, v: jnp.argmin(jnp.where(v[None, :],
        jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, -1), jnp.inf), axis=1)
)(src, tgt, valid))())
n2 = np.asarray(jax.jit(lambda: jax.vmap(
    lambda a, b, v: jnp.argmin(jnp.where(v[None, :],
        jnp.sum(a*a,1)[:, None] + jnp.sum(b*b,1)[None, :]
        - 2.0*jnp.matmul(a, b.T, precision=jax.lax.Precision.HIGHEST),
        jnp.inf), axis=1))(src, tgt, valid))())
print("argmin agreement:", float((n1 == n2).mean()))
