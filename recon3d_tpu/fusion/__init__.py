from recon3d_tpu.fusion.tsdf import TSDFVolume, integrate, make_volume  # noqa: F401
