"""Pallas kernel tests (interpreter mode on the CPU mesh)."""
import numpy as np
import jax.numpy as jnp
import pytest

from tbv_slam_public_tpu.ops import coral
from tbv_slam_public_tpu.pallas import coral_moments


@pytest.mark.parametrize("q,p", [(50, 70), (128, 512), (200, 600)])
def test_coral_moments_matches_reference(rng, q, p):
    queries = rng.uniform(-30, 30, (q, 2)).astype(np.float32)
    points = rng.uniform(-30, 30, (p, 2)).astype(np.float32)
    qmask = rng.uniform(size=q) < 0.8
    pmask = rng.uniform(size=p) < 0.8
    radius = 2.5

    n0, s10, s20 = coral._neighbor_moments(
        jnp.asarray(queries), jnp.asarray(qmask), jnp.asarray(points),
        jnp.asarray(pmask), radius)
    n1, s11, s21 = coral_moments.neighbor_moments(
        jnp.asarray(queries), jnp.asarray(qmask), jnp.asarray(points),
        jnp.asarray(pmask), radius, interpret=True)

    np.testing.assert_allclose(np.asarray(n1), np.asarray(n0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s11), np.asarray(s10),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s21), np.asarray(s20),
                               rtol=1e-5, atol=1e-4)


def test_coral_moments_empty_masks(rng):
    q, p = 64, 128
    queries = rng.uniform(-5, 5, (q, 2)).astype(np.float32)
    points = rng.uniform(-5, 5, (p, 2)).astype(np.float32)
    n, s1, s2 = coral_moments.neighbor_moments(
        jnp.asarray(queries), jnp.zeros(q, bool), jnp.asarray(points),
        jnp.zeros(p, bool), 1.0, interpret=True)
    assert float(jnp.sum(n)) == 0.0
    assert float(jnp.sum(jnp.abs(s1))) == 0.0
