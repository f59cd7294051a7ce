"""End-to-end odometry test on a simulated sequence."""
import numpy as np
import pytest

from tbv_slam_public_tpu.core import se2
from tbv_slam_public_tpu.core.config import (FeatureConfig, OdometryConfig,
                                             RadarConfig, RegistrationConfig,
                                             TBVConfig)
from tbv_slam_public_tpu.io import simulate
from tbv_slam_public_tpu.models.odometry import OdometryPipeline


def small_config():
    return TBVConfig(
        radar=RadarConfig(num_azimuths=200, num_range_bins=256, range_res=0.3,
                          k_strongest=12, min_distance=1.0, max_distance=75.0),
        features=FeatureConfig(resolution=3.0, cell_capacity=256,
                               grid_extent=80.0),
        registration=RegistrationConfig(cost="P2L", weight_option=4),
        # the simulator renders instantaneous snapshots -> no de-skew
        odometry=OdometryConfig(submap_scan_size=3, compensate=False),
    )


@pytest.fixture(scope="module")
def seq():
    return simulate.make_sequence(
        num_frames=40, seed=0, num_azimuths=200, num_range_bins=256,
        range_res=0.3, traj_kwargs=dict(radius=40.0, step=0.7, laps=0.12))


def test_odometry_tracks_ground_truth(seq):
    cfg = small_config()
    pipe = OdometryPipeline(cfg)
    for i in range(seq.images.shape[0]):
        pipe.process(seq.images[i], stamp=i * 0.25)

    est = np.asarray(pipe.frame_poses)
    gt = seq.gt_poses.copy()
    # rebase gt to the first frame (odometry starts at identity)
    import jax.numpy as jnp
    g0 = gt[0]
    gt_rel = np.asarray([np.asarray(se2.relative(jnp.asarray(g0), jnp.asarray(g)))
                         for g in gt])

    total_dist = np.sum(np.linalg.norm(np.diff(gt_rel[:, :2], axis=0), axis=1))
    final_err = np.linalg.norm(est[-1, :2] - gt_rel[-1, :2])
    # < 3% drift over the sequence
    assert final_err < 0.03 * total_dist, (final_err, total_dist)
    yaw_err = abs(float(se2.wrap_angle(jnp.asarray(est[-1, 2] - gt_rel[-1, 2]))))
    assert yaw_err < 0.03

    # keyframes spaced by the 1.5 m gate
    assert len(pipe.kf_poses) >= 10
    kf = np.asarray(pipe.kf_poses)
    gaps = np.linalg.norm(np.diff(kf[:, :2], axis=0), axis=1)
    assert np.all(gaps > 1.0)

    # odometry constraints chain consistently to the keyframe poses
    for c in pipe.kf_constraints:
        a = kf[c["id_begin"]]
        b = kf[c["id_end"]]
        pred = np.asarray(se2.compose(jnp.asarray(a), jnp.asarray(c["t_be"])))
        assert np.linalg.norm(pred[:2] - b[:2]) < 1e-3


def test_keyframe_gate_blocks_stationary():
    cfg = small_config()
    rng = np.random.default_rng(7)
    world = simulate.make_world(rng, num_walls=50)
    img = simulate.render_scan(world, np.zeros(3), num_azimuths=200,
                               num_range_bins=256, range_res=0.3, rng=rng)
    pipe = OdometryPipeline(cfg)
    for i in range(5):
        out = pipe.process(img)
    # the platform never moves -> only the seed keyframe exists
    assert len(pipe.kf_poses) == 1
    assert np.linalg.norm(np.asarray(out.pose)[:2]) < 0.2


def test_batched_odometry_matches_single(seq):
    """B sequences in one vmapped step must produce the same trajectories as
    running each alone."""
    import jax
    import jax.numpy as jnp
    from tbv_slam_public_tpu.models import odometry as om

    cfg = small_config()
    n = 12
    # two different sequences: the fixture and a shifted start
    seq2 = simulate.make_sequence(
        num_frames=n, seed=9, num_azimuths=200, num_range_bins=256,
        range_res=0.3, traj_kwargs=dict(radius=35.0, step=0.6, laps=0.1))
    imgs = [seq.images[:n], seq2.images[:n]]

    # single-sequence references
    singles = []
    for im in imgs:
        st = om.init_state(cfg)
        st, _ = om.first_frame(st, jnp.asarray(im[0]), cfg)
        poses = [np.zeros(3)]
        for k in range(1, n):
            st, out = om.odometry_step(st, jnp.asarray(im[k]), cfg)
            poses.append(np.asarray(out.pose))
        singles.append(np.stack(poses))

    # batched
    bstate = om.init_batched_state(cfg, 2)
    batch_imgs = jnp.stack([jnp.asarray(im[0]) for im in imgs])
    bstate, _ = om.batched_first_frame(bstate, batch_imgs, cfg)
    bposes = [np.zeros((2, 3))]
    for k in range(1, n):
        batch_imgs = jnp.stack([jnp.asarray(im[k]) for im in imgs])
        bstate, bout = om.batched_odometry_step(bstate, batch_imgs, cfg)
        bposes.append(np.asarray(bout.pose))
    bposes = np.stack(bposes, axis=1)  # [2, n, 3]

    for b in range(2):
        np.testing.assert_allclose(bposes[b], singles[b], atol=1e-4)


def test_chunked_odometry_matches_per_frame(seq):
    """process_chunk (lax.scan device chunks) must produce the same frame
    poses, keyframes and constraints as the per-frame host loop."""
    cfg = small_config()
    ref = OdometryPipeline(cfg)
    for i in range(seq.images.shape[0]):
        ref.process(seq.images[i], stamp=i * 0.25)

    chk = OdometryPipeline(cfg)
    n = seq.images.shape[0]
    for lo in range(0, n, 7):  # deliberately awkward chunk size
        hi = min(lo + 7, n)
        chk.process_chunk(seq.images[lo:hi],
                          stamps=[i * 0.25 for i in range(lo, hi)])

    np.testing.assert_allclose(np.asarray(chk.frame_poses),
                               np.asarray(ref.frame_poses), atol=1e-5)
    assert len(chk.kf_poses) == len(ref.kf_poses)
    np.testing.assert_allclose(np.asarray(chk.kf_poses),
                               np.asarray(ref.kf_poses), atol=1e-5)
    assert len(chk.kf_constraints) == len(ref.kf_constraints)
    for a, b in zip(chk.kf_constraints, ref.kf_constraints):
        assert a["id_begin"] == b["id_begin"] and a["id_end"] == b["id_end"]
        np.testing.assert_allclose(a["t_be"], b["t_be"], atol=1e-5)
    # keyframe payloads identical too (cells feed loop closure)
    np.testing.assert_allclose(
        np.asarray(chk.kf_cells[-1].mean), np.asarray(ref.kf_cells[-1].mean),
        atol=1e-5)
