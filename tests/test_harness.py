"""CLI harness tests: odometry -> checkpoint -> slam, eval, and a 2-job sweep."""
import json
import os

import numpy as np
import pytest

from tbv_slam_public_tpu.harness import cli, sweep

FAST = ["radar.k_strongest=4", "features.cell_capacity=192",
        "features.grid_extent=60.0", "verification.peaks_capacity=1024",
        "loopclosure.local_map_capacity=1024", "scancontext.db_chunk=64",
        "odometry.compensate=false", "registration.cost=P2L",
        "verification.model_threshold=0.5"]


@pytest.fixture(scope="module")
def odometry_out(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("odom"))
    rc = cli.main(["odometry", "--dataset", "sim:80:5", "--output", out] + FAST)
    assert rc == 0
    return out


def test_odometry_outputs(odometry_out):
    out = odometry_out
    for f in ("odom/00.txt", "odom/00.tum", "odom/00_gt.txt",
              "odom/result.txt", "simple_graph.npz", "pars.txt",
              "time_statistics.txt"):
        assert os.path.exists(os.path.join(out, f)), f
    est = np.loadtxt(os.path.join(out, "odom", "00.txt"))
    assert est.shape[1] == 12 and est.shape[0] == 80
    # pars.txt echoes overrides
    pars = open(os.path.join(out, "pars.txt")).read()
    assert "radar.k_strongest, 4" in pars


def test_slam_from_checkpoint_cli(odometry_out, tmp_path):
    out = str(tmp_path / "slam")
    rc = cli.main(["slam", "--graph",
                   os.path.join(odometry_out, "simple_graph.npz"),
                   "--output", out] + FAST)
    assert rc == 0
    for f in ("est/00.txt", "est/result.txt", "odom/00.txt",
              "loop/loop.csv", "full_graph.npz", "time_statistics.txt"):
        assert os.path.exists(os.path.join(out, f)), f


def test_eval_cli(odometry_out, tmp_path, capsys):
    gt = os.path.join(odometry_out, "odom", "00_gt.txt")
    est = os.path.join(odometry_out, "odom", "00.txt")
    rc = cli.main(["eval", "--gt", gt, "--est", est,
                   "--output", str(tmp_path / "result.txt")])
    assert rc == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "ate_rmse" in m and m["ate_rmse"] < 5.0


def test_sweep_two_jobs(tmp_path):
    par = tmp_path / "pars.csv"
    par.write_text("# sweep over the filter\nradar.k_strongest,4,6\n")
    out = str(tmp_path / "sweep")
    results = sweep.run_sweep(
        str(par), "sim:30:1", out,
        base_overrides=[t for t in FAST if not t.startswith("radar.")],
        workers=1, mode="odometry")
    assert len(results) == 2
    assert os.path.exists(os.path.join(out, "job_0", "odom", "00.txt"))
    assert os.path.exists(os.path.join(out, "job_1", "odom", "00.txt"))
    assert os.path.exists(os.path.join(out, "merged.csv"))
    assert results[0]["pars"] == "radar.k_strongest=4"
    assert results[1]["pars"] == "radar.k_strongest=6"
