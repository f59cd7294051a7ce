import numpy as np
import jax.numpy as jnp

from tbv_slam_public_tpu.core import se2, se3


def random_pose(rng):
    return jnp.asarray([rng.uniform(-10, 10), rng.uniform(-10, 10),
                        rng.uniform(-np.pi, np.pi)], jnp.float32)


def test_compose_inverse_roundtrip(rng):
    a = random_pose(rng)
    assert np.allclose(se2.compose(a, se2.inverse(a)), np.zeros(3), atol=1e-5)
    assert np.allclose(se2.compose(se2.inverse(a), a), np.zeros(3), atol=1e-5)


def test_compose_matches_matrix(rng):
    a, b = random_pose(rng), random_pose(rng)
    ab = se2.compose(a, b)
    ma = se3.se2_to_matrix4(np.asarray(a)[None])[0]
    mb = se3.se2_to_matrix4(np.asarray(b)[None])[0]
    mab = se3.se2_to_matrix4(np.asarray(ab)[None])[0]
    assert np.allclose(ma @ mb, mab, atol=1e-4)


def test_apply_points(rng):
    a = random_pose(rng)
    pts = jnp.asarray(rng.normal(size=(5, 2)), jnp.float32)
    out = se2.apply(a, pts)
    m = se3.se2_to_matrix4(np.asarray(a)[None])[0]
    expect = (m[:2, :2] @ np.asarray(pts).T).T + m[:2, 3]
    assert np.allclose(out, expect, atol=1e-5)


def test_relative(rng):
    a, b = random_pose(rng), random_pose(rng)
    rel = se2.relative(a, b)
    assert np.allclose(se2.compose(a, rel), b, atol=1e-5)


def test_wrap_angle():
    for raw in [3 * np.pi, -3 * np.pi, 0.5, -0.5, 7.0]:
        w = float(se2.wrap_angle(jnp.asarray(raw)))
        assert -np.pi - 1e-6 <= w <= np.pi + 1e-6
        assert abs(np.cos(w) - np.cos(raw)) < 1e-5
        assert abs(np.sin(w) - np.sin(raw)) < 1e-5


def test_interpolate_endpoints(rng):
    a, b = random_pose(rng), random_pose(rng)
    assert np.allclose(se2.interpolate(a, b, 0.0), a, atol=1e-6)
    assert np.allclose(se2.interpolate(a, b, 1.0), b, atol=1e-6)
