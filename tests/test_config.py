from recon3d_tpu.config import (
    ScannerConfig,
    StereoMatcherConfig,
    WLSConfig,
    parse_scanner_config,
)


def test_defaults_match_reference():
    m = StereoMatcherConfig()
    assert m.num_disparities == 128 and m.block_size == 5
    assert m.p1() == 8 * 1 * 25 and m.p2() == 32 * 1 * 25
    w = WLSConfig()
    assert w.lam == 8000.0 and w.sigma_color == 1.5


def test_adjust_clamps():
    m = StereoMatcherConfig(block_size=11, num_disparities=256)
    assert m.adjust("q").block_size == 11
    assert m.adjust("w").num_disparities == 256
    m = StereoMatcherConfig(block_size=3, num_disparities=16)
    assert m.adjust("a").block_size == 3
    assert m.adjust("s").num_disparities == 16
    assert m.adjust("w").num_disparities == 32


def test_cli_reference_aliases():
    cfg = parse_scanner_config([
        "--voxel_size", "0.008",
        "--sdf_trunc", "0.04",
        "--fps", "15",
        "--downsample_voxel_size", "0.005",
        "--output_dir", "/tmp/xyz",
    ])
    assert cfg.fusion.voxel_size == 0.008
    assert cfg.fusion.sdf_trunc == 0.04
    assert cfg.stream.fps == 15
    assert cfg.processing.voxel_size == 0.005
    assert cfg.output_dir == "/tmp/xyz"


def test_nested_flags():
    cfg = parse_scanner_config(["--matcher.num_disparities", "64", "--wls.lam", "4000"])
    assert cfg.matcher.num_disparities == 64
    assert cfg.wls.lam == 4000.0
    assert isinstance(cfg, ScannerConfig)
