from recon3d_tpu.camera.base import Camera, ThreadedCamera  # noqa: F401
from recon3d_tpu.camera.fake import FakeRGBDCamera, FakeStereoCamera, SyntheticRGBDCamera  # noqa: F401
