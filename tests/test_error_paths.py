"""Failure-mode probes: malformed inputs must fail fast with a clear error.

The reference scripts mostly crash with raw tracebacks on bad input (e.g.
cv2 asserting deep inside StereoSGBM when an NPZ is missing keys); here
every user-facing entry point is expected to raise a meaningful exception
at the boundary instead. These are the "probes that matter" from the
project verify recipe: typo'd CLI flag, missing replay dir, garbage /
truncated PLY, wrong-schema NPZ, undersized PointCloud capacity.
"""
from __future__ import annotations

import os

import numpy as np
import pytest

from recon3d_tpu import cli
from recon3d_tpu.calib import npz as cnpz
from recon3d_tpu.camera.fake import FakeRGBDCamera
from recon3d_tpu.utils import io
from recon3d_tpu.utils.types import PointCloud


def test_cli_unknown_flag_exits_2_naming_it(capsys):
    with pytest.raises(SystemExit) as ei:
        cli.main(["scan", "--no-such-flag"])
    assert ei.value.code == 2
    assert "--no-such-flag" in capsys.readouterr().err


def test_missing_replay_dir_raises_file_not_found(tmp_path):
    cam = FakeRGBDCamera(str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError, match="no color/depth pairs"):
        cam.open()


def test_garbage_ply_rejected(tmp_path):
    p = tmp_path / "garbage.ply"
    p.write_bytes(b"\x00\x01 definitely not a ply")
    with pytest.raises(ValueError, match="not a PLY"):
        io.read_ply(str(p))


def test_truncated_binary_ply_raises_not_partial_data(tmp_path):
    ok = tmp_path / "ok.ply"
    io.write_ply(str(ok), np.random.RandomState(0).rand(100, 3))
    data = ok.read_bytes()
    trunc = tmp_path / "trunc.ply"
    trunc.write_bytes(data[: len(data) // 2])
    # must raise, never return a silently shortened cloud
    with pytest.raises(ValueError):
        io.read_ply(str(trunc))


def test_wrong_schema_npz_names_found_keys(tmp_path):
    p = tmp_path / "wrong.npz"
    np.savez(str(p), foo=np.eye(3))
    with pytest.raises(ValueError, match="unrecognized stereo NPZ schema"):
        cnpz.StereoParams.load(str(p))


def test_pointcloud_capacity_smaller_than_n_rejected():
    with pytest.raises(ValueError, match="capacity 5 < number of points 10"):
        PointCloud.from_numpy(np.zeros((10, 3), np.float32), capacity=5)


def test_doctor_reports_environment(capsys):
    rc = cli.main(["doctor"])
    out = capsys.readouterr().out
    assert "jax backend" in out and "golden replay fixtures" in out
    assert rc == 0  # tests run with a live CPU backend


def test_bench_pointops_subprocess_contract(tmp_path):
    """bench.py's extras shell out to tools/bench_pointops.py and parse its
    LAST stdout line as {"ms": N} — pin that contract (both ops) on CPU."""
    import json
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "bench_pointops.py"),
         "voxel", "--n", "20000", "--capacity", "4096", "--reps", "1"],
        capture_output=True, text=True, timeout=600, env=env, cwd=root)
    assert r.returncode == 0, r.stderr[-500:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["ms"] > 0
