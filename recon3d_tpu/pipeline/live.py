"""Live display + interactive tuning: the depth4.py imshow loop equivalent.

The reference's real-time depth tools show the rectified view and the JET
disparity colormap in OpenCV windows and retune SGBM/WLS parameters from
the keyboard (depth4.py:278-365; Calib.py:97-131). This module is the
thin host-side twin: frames come from any DepthPipeline / StreamingScanner,
display goes through cv2.imshow when a GUI is available, and the keyboard
handler maps to the same q/a/w/s/e/d/r/f adjustments via config.adjust —
retuning never recompiles (tunables are traced scalars; shapes are the only
static axis).

Headless environments (no cv2, no display) still get the key-handling and
frame-sink machinery: pass a `sink` callable to capture frames instead of
showing them, which is also how the tests drive this without a screen.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np

#: keyboard map, matching depth4.py:295-365 / Calib.py:97-131
KEY_HELP = {
    "q": "block size +2 (max 11)",
    "a": "block size -2 (min 3)",
    "w": "numDisparities +16 (max 256)",
    "s": "numDisparities -16 (min 16)",
    "e": "WLS lambda x2",
    "d": "WLS lambda /2",
    "r": "WLS sigma +0.25",
    "f": "WLS sigma -0.25",
    "\x1b": "quit (ESC)",
}


def _have_gui() -> bool:
    try:
        import cv2  # noqa: F401
    except Exception:
        return False
    import os

    return bool(os.environ.get("DISPLAY") or os.name == "nt")


class LiveDepthViewer:
    """Show disparity/depth frames and forward key presses to the pipeline.

    viewer = LiveDepthViewer(pipe)           # pipe: DepthPipeline
    viewer.run(cam_left, cam_right)          # blocks; ESC quits

    With no GUI available, pass sink=fn(name, image) to receive the frames
    (e.g. a recorder or a test probe); keys can be injected via handle_key.
    """

    def __init__(self, pipeline, sink: Optional[Callable] = None,
                 window: str = "recon3d depth"):
        self.pipeline = pipeline
        self.window = window
        self.sink = sink
        self.gui = sink is None and _have_gui()
        self.frames_shown = 0
        self.keys_handled = []

    def handle_key(self, key: str) -> bool:
        """Apply one tuning key; returns False when the key means quit."""
        if key == "\x1b":
            return False
        if key in KEY_HELP:
            self.pipeline.adjust(key)
            self.keys_handled.append(key)
        return True

    def show(self, name: str, img: np.ndarray) -> None:
        arr = np.asarray(img)
        if arr.dtype != np.uint8:
            arr = np.clip(arr * (255.0 if arr.max() <= 1.0 else 1.0),
                          0, 255).astype(np.uint8)
        if self.gui:
            import cv2

            cv2.imshow(f"{self.window}:{name}", arr[..., ::-1]
                       if arr.ndim == 3 else arr)
        elif self.sink is not None:
            self.sink(name, arr)
        self.frames_shown += 1

    def run(self, camera_left, camera_right,
            max_frames: Optional[int] = None) -> int:
        """depth4.py main loop: process -> show -> poll keys (depth4.py:238-292)."""
        def on_frame(n, out):
            disp, depth, vis = out
            self.show("disparity", np.asarray(vis))
            if self.gui:
                import cv2

                k = cv2.waitKey(1) & 0xFF
                if k != 255 and not self.handle_key(chr(k)):
                    return False
            return True

        n = self.pipeline.run(camera_left, camera_right,
                              max_frames=max_frames, on_frame=on_frame)
        if self.gui:
            import cv2

            cv2.destroyAllWindows()
        return n
