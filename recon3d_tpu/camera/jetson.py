"""Jetson CSI camera via GStreamer/nvargus (gated on an OpenCV GStreamer build).

Rebuilds Calib_depth/Camera/jetsonCam.py:89-117's nvarguscamerasrc pipeline
string and open/read lifecycle. Wrap in ThreadedCamera for the background
latest-frame loop (jetsonCam.py:57-75 equivalent).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from recon3d_tpu.camera.base import Camera


def gstreamer_pipeline(sensor_id=0, capture_width=1920, capture_height=1080,
                       display_width=960, display_height=540,
                       framerate=30, flip_method=0) -> str:
    """nvargus CSI source string (reference: jetsonCam.py:89-117)."""
    return (
        f"nvarguscamerasrc sensor-id={sensor_id} ! "
        f"video/x-raw(memory:NVMM), width=(int){capture_width}, "
        f"height=(int){capture_height}, framerate=(fraction){framerate}/1 ! "
        f"nvvidconv flip-method={flip_method} ! "
        f"video/x-raw, width=(int){display_width}, height=(int){display_height}, "
        f"format=(string)BGRx ! videoconvert ! "
        f"video/x-raw, format=(string)BGR ! appsink"
    )


class JetsonCSICamera(Camera):
    def __init__(self, sensor_id=0, capture_width=1920, capture_height=1080,
                 display_width=960, display_height=540, framerate=30, flip_method=0):
        self.pipeline = gstreamer_pipeline(sensor_id, capture_width, capture_height,
                                           display_width, display_height,
                                           framerate, flip_method)
        self._cap = None

    def open(self) -> None:
        import cv2

        self._cap = cv2.VideoCapture(self.pipeline, cv2.CAP_GSTREAMER)
        if not self._cap.isOpened():
            raise RuntimeError(f"failed to open CSI camera: {self.pipeline}")

    def grab(self) -> Optional[Tuple[np.ndarray]]:
        ok, frame = self._cap.read()
        return (frame,) if ok else None

    def close(self) -> None:
        if self._cap is not None:
            self._cap.release()
            self._cap = None


class USBCamera(Camera):
    """Plain V4L/index camera (reference: Calib_depth/test.py:4-22 smoke path)."""

    def __init__(self, index: int = 0):
        self.index = index
        self._cap = None

    def open(self) -> None:
        import cv2

        self._cap = cv2.VideoCapture(self.index)
        if not self._cap.isOpened():
            raise RuntimeError(f"failed to open camera index {self.index}")

    def grab(self) -> Optional[Tuple[np.ndarray]]:
        ok, frame = self._cap.read()
        return (frame,) if ok else None

    def close(self) -> None:
        if self._cap is not None:
            self._cap.release()
            self._cap = None
