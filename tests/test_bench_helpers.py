"""bench.py's resilience machinery (pure-host logic; the driver's round
depends on it emitting a JSON line under any failure mode)."""
import time

import pytest

import bench


def test_section_guard_times_out_and_is_catchable():
    with pytest.raises(bench._SectionTimeout):
        with bench.section_guard("t", 1):
            time.sleep(2.5)
    # the alarm must be disarmed after the section
    time.sleep(1.2)  # would re-fire here if still armed


def test_section_guard_normal_exit_disarms():
    with bench.section_guard("t", 5):
        pass
    time.sleep(0.1)


def test_section_guard_propagates_other_exceptions():
    with pytest.raises(ValueError):
        with bench.section_guard("t", 5):
            raise ValueError("x")


def test_heartbeat_prints_section(capsys):
    bench.hb("phase-x", a=1)
    out = capsys.readouterr().out
    assert out.startswith("# [")
    assert "phase-x a=1" in out


def test_synthetic_maps_roundtrip():
    """The bench's rectification model must be invertible to sub-pixel:
    the inverse maps are what make the benched remap a REAL
    rectification comparable to analytic truth."""
    import numpy as np

    H, W = 120, 160
    mx, my = bench._synthetic_maps(H, W)
    imx, imy = bench._inverse_maps(H, W)
    # forward(inverse(x)) ~ x on the interior
    fx, fy = bench._forward_xy(imx.astype(np.float64),
                               imy.astype(np.float64), H, W)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    err = np.hypot(fx - xx, fy - yy)[8:-8, 8:-8]
    assert err.max() < 0.01, err.max()
