"""Tkinter stereo-calibration GUI — the calib3_2.py:249-455 twin.

Display-gated interactive layer over the headless calibration core
(calib/api.py): live side-by-side preview from two cameras, a capture
button that appends synchronized pairs, a calibrate button that runs the
full stereoCalibrate workflow (corners -> per-camera -> stereo -> rectify
-> NPZ + report), a save-images toggle (calib3_2.py:401-404), and the
load-from-folder batch mode (calib3_2.py:355-399).

Construction is headless-testable (widgets are only built inside run(),
which requires a display); the logic methods (capture_pair,
run_calibration, load_folder) are plain callables over the camera pair so
tests drive them without Tk.
"""
from __future__ import annotations

import os
import threading
from typing import List, Optional, Tuple

import numpy as np


class CalibrationSession:
    """Headless state + actions behind the GUI (and usable without it)."""

    def __init__(self, cam_left, cam_right, pattern_size=(9, 6),
                 square_size: float = 1.0, output_dir: str = ".",
                 name: str = "stereo_rig", save_images: bool = False):
        self.cam_left = cam_left
        self.cam_right = cam_right
        self.pattern_size = pattern_size
        self.square_size = square_size
        self.output_dir = output_dir
        self.name = name
        self.save_images = save_images
        self.pairs: List[Tuple[np.ndarray, np.ndarray]] = []
        self.status = "ready"

    def read_pair(self) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        fl = self.cam_left.read() if hasattr(self.cam_left, "read") else (True, self.cam_left.grab())
        fr = self.cam_right.read() if hasattr(self.cam_right, "read") else (True, self.cam_right.grab())
        okl, l = fl if isinstance(fl, tuple) and len(fl) == 2 else (fl is not None, fl)
        okr, r = fr if isinstance(fr, tuple) and len(fr) == 2 else (fr is not None, fr)
        if not okl or not okr or l is None or r is None:
            return None
        l = l[0] if isinstance(l, tuple) else l
        r = r[0] if isinstance(r, tuple) else r
        return np.asarray(l), np.asarray(r)

    def capture_pair(self) -> bool:
        """Append the current synchronized frame pair (calib3_2.py:336-353)."""
        pair = self.read_pair()
        if pair is None:
            self.status = "no frame"
            return False
        self.pairs.append(pair)
        if self.save_images:
            from recon3d_tpu.utils import io

            os.makedirs(self.output_dir, exist_ok=True)
            k = len(self.pairs) - 1
            io.write_color(os.path.join(self.output_dir, f"left_{k:03d}.png"),
                           np.ascontiguousarray(pair[0]))
            io.write_color(os.path.join(self.output_dir, f"right_{k:03d}.png"),
                           np.ascontiguousarray(pair[1]))
        self.status = f"{len(self.pairs)} pairs captured"
        return True

    def load_folder(self, folder: str) -> int:
        """Batch mode: append saved pairs from disk (calib3_2.py:355-399)."""
        import glob

        from recon3d_tpu.utils import io

        lefts = sorted(glob.glob(os.path.join(folder, "left_*.png")))
        rights = sorted(glob.glob(os.path.join(folder, "right_*.png")))
        for pl, pr in zip(lefts, rights):
            self.pairs.append((io.read_color(pl), io.read_color(pr)))
        self.status = f"{len(self.pairs)} pairs (loaded {len(lefts)})"
        return len(lefts)

    def run_calibration(self):
        """Full workflow on the captured pairs (calib3_2.py:355-390)."""
        from recon3d_tpu.calib.api import stereo_calibrate_camera

        if len(self.pairs) < 3:
            self.status = "need >= 3 pairs"
            return None, None
        self.status = "calibrating..."
        os.makedirs(self.output_dir, exist_ok=True)
        save = os.path.join(self.output_dir, f"{self.name}_stereo.npz")
        rep = os.path.join(self.output_dir, f"{self.name}_calibration_report.txt")
        params, info = stereo_calibrate_camera(
            [p[0] for p in self.pairs], [p[1] for p in self.pairs],
            pattern_size=self.pattern_size, square_size=self.square_size,
            save_path=save, report_path=rep)
        self.status = (f"done: rms L/R {info['rms_left']:.4f}/"
                       f"{info['rms_right']:.4f}, saved {save}")
        return params, info


class CalibrationGUI:
    """Tk window wiring a CalibrationSession (requires a display)."""

    def __init__(self, session: CalibrationSession, preview_ms: int = 30):
        self.session = session
        self.preview_ms = preview_ms
        self._stop = threading.Event()

    def run(self) -> None:  # pragma: no cover - needs a display
        import tkinter as tk

        from PIL import Image, ImageTk

        root = tk.Tk()
        root.title("recon3d_tpu stereo calibration")
        label = tk.Label(root)
        label.pack()
        status = tk.StringVar(value=self.session.status)
        tk.Label(root, textvariable=status).pack()
        save_var = tk.BooleanVar(value=self.session.save_images)

        def on_save_toggle():
            self.session.save_images = bool(save_var.get())

        def on_capture():
            self.session.capture_pair()
            status.set(self.session.status)

        calibrating = threading.Event()

        def on_calibrate():
            if calibrating.is_set():
                return
            calibrating.set()
            status.set("calibrating...")

            def work():
                try:
                    self.session.run_calibration()
                finally:
                    # Tk is not thread-safe: marshal the StringVar update
                    # (and the preview un-pause) back onto the Tk thread
                    def done():
                        calibrating.clear()
                        status.set(self.session.status)

                    root.after(0, done)

            threading.Thread(target=work, daemon=True).start()

        def on_load():
            from tkinter import filedialog

            folder = filedialog.askdirectory()
            if folder:
                self.session.load_folder(folder)
                status.set(self.session.status)

        bar = tk.Frame(root)
        bar.pack()
        tk.Button(bar, text="Capture", command=on_capture).pack(side=tk.LEFT)
        tk.Button(bar, text="Calibrate", command=on_calibrate).pack(side=tk.LEFT)
        tk.Button(bar, text="Load folder", command=on_load).pack(side=tk.LEFT)
        tk.Checkbutton(bar, text="Save images", variable=save_var,
                       command=on_save_toggle).pack(side=tk.LEFT)
        tk.Button(bar, text="Quit", command=root.destroy).pack(side=tk.LEFT)

        def tick():
            if self._stop.is_set():
                root.destroy()
                return
            if calibrating.is_set():
                # pause the preview: don't read the cameras concurrently
                # with the calibration worker thread
                root.after(self.preview_ms, tick)
                return
            pair = self.session.read_pair()
            if pair is not None:
                both = np.concatenate(pair, axis=1)
                img = ImageTk.PhotoImage(Image.fromarray(both.astype(np.uint8)))
                label.configure(image=img)
                label.image = img
            root.after(self.preview_ms, tick)

        tick()
        root.mainloop()
