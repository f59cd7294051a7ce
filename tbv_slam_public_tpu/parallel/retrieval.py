"""Sharded descriptor-database retrieval (SURVEY §5.7).

The reference's place-recognition search is a linear scan over ALL history on
one CPU core (`OdometryNNSearch`, RadarScancontext.cpp:259-284).  Here the
keyframe descriptor database — the [N, R(+odom)] ring-key matrix plus the
[N, R, S] descriptors — lives SHARDED across the device mesh on the keyframe
axis, and retrieval is:

1. per shard: masked ring-key L2 + local top-k (num_candidates),
2. per shard: full ScanContext distance for the LOCAL winners only — the
   descriptors never leave their shard; the expensive [R, S] scoring is
   D-way parallel,
3. all_gather of the D×K tiny candidate records + an exact global top-k
   merge (stable in global index order, so tie-breaking matches the
   single-device `ops.scancontext.retrieve` bit-for-bit).

Communication per query: D×K records of 5 scalars — independent of database
size.  At Oxford scale (4471 keyframes × 40×120 descriptors ≈ 86 MB) the
descriptor matrix is what sharding distributes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import scancontext
from ..ops.scancontext import RetrievalResult

AXIS = "db"


def make_db_mesh(devices=None, axis: str = AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


@partial(jax.jit, static_argnames=("mesh", "num_candidates", "search_ratio",
                                   "odometry_coupled"))
def sharded_retrieve(
    mesh: Mesh,
    query_desc: jnp.ndarray,  # [R, S] replicated
    query_key: jnp.ndarray,  # [R]
    db_desc: jnp.ndarray,  # [N, R, S] sharded on N
    db_key: jnp.ndarray,  # [N, R]
    db_mask: jnp.ndarray,  # [N] bool
    odom_similarity: jnp.ndarray,  # [N]
    *,
    num_candidates: int,
    search_ratio: float,
    odometry_coupled: bool = True,
) -> RetrievalResult:
    """Mesh-sharded equivalent of ops.scancontext.retrieve.

    N must be divisible by the mesh size (the DB is padded in chunks, so
    pick db_chunk % n_devices == 0).
    """
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    n = db_mask.shape[0]
    assert n % ndev == 0, f"db capacity {n} not divisible by mesh {ndev}"
    nl = n // ndev
    k = num_candidates

    def local_fn(qd, qk, dd, dk, dm, osim):
        # leaves arrive as the LOCAL shard: dd [Nl, R, S] etc.
        shard = jax.lax.axis_index(axis)
        d2 = jnp.sum((dk - qk[None, :]) ** 2, axis=-1)
        if odometry_coupled:
            d2 = d2 + (10.0 * osim) ** 2
        d2 = jnp.where(dm, d2, jnp.inf)
        neg, lidx = jax.lax.top_k(-d2, k)
        # score local winners only: descriptors stay on their shard
        cands = dd[lidx]
        dist_fn = lambda c: scancontext.sc_distance(
            qd, c, search_ratio=search_ratio)
        dist_sc, shift = jax.vmap(dist_fn)(cands)
        gidx = lidx + shard * nl
        dist_odom = jnp.where(odometry_coupled, osim[lidx], 0.0)

        # gather D×K records; merge by the ring-key criterion (exactly the
        # quantity the single-device top_k ranks on)
        all_neg = jax.lax.all_gather(neg, axis).reshape(-1)  # [D*K]
        all_gidx = jax.lax.all_gather(gidx, axis).reshape(-1)
        all_sc = jax.lax.all_gather(dist_sc, axis).reshape(-1)
        all_shift = jax.lax.all_gather(shift, axis).reshape(-1)
        all_odom = jax.lax.all_gather(dist_odom, axis).reshape(-1)
        # stable global merge: rank by (-neg, global index) so equal scores
        # resolve to the smallest database id, matching single-device top_k
        order = jnp.lexsort((all_gidx, -all_neg))[:k]
        neg_m = all_neg[order]
        valid = jnp.isfinite(-neg_m)
        dist_sc_m = all_sc[order]
        dist_odom_m = all_odom[order]
        total = jnp.where(valid, dist_sc_m + dist_odom_m, jnp.inf)
        return RetrievalResult(
            dist=total, dist_sc=dist_sc_m, dist_odom=dist_odom_m,
            index=all_gidx[order], shift=all_shift[order], valid=valid)

    from jax import shard_map

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=RetrievalResult(dist=P(), dist_sc=P(), dist_odom=P(),
                                  index=P(), shift=P(), valid=P()),
        check_vma=False)
    return fn(query_desc, query_key, db_desc, db_key, db_mask,
              odom_similarity)


def shard_db(mesh: Mesh, db):
    """Place a models.loopclosure.LoopDB with its keyframe axis sharded over
    the mesh (descriptors/keys/poses/mask all shard on axis 0)."""
    axis = mesh.axis_names[0]
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), db)
