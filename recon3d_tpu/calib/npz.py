"""Calibration NPZ archive schemas: load/save/validate/inspect.

The reference persists calibration as NPZ checkpoints between the calibrate
and depth programs. Three schemas ship in its artifacts (all verified against
/root/reference/Calib_depth/*.npz):

  STEREO_FULL  keys: mtx1,dist1,mtx2,dist2,R,T,E,F,R1,R2,P1,P2,Q
               (written at calib3_2.py:197-199, read at depth4.py:89-104)
  STEREO_RAW   keys: k1,d1,k2,d2,R,T           (Calib.py:212-221 loaders :227-250)
  MONO         keys: k,d,r,t                    (per-camera, calib1.py)
  MONO_CUSTOM  keys: K_matrix,Dist,r_vecs,t_vecs
               (Camera/CustomCalibrateCamera/Calib_Camera.py:21-131)
  STEREO_EXT   STEREO_FULL + Baseline/image size extras (readPar.py:20-51)

This module replaces readPar.py (load/validate/pretty-print) and
inspect_calibration_file.py (key dump).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np

STEREO_FULL_KEYS = ("mtx1", "dist1", "mtx2", "dist2", "R", "T", "E", "F", "R1", "R2", "P1", "P2", "Q")
STEREO_RAW_KEYS = ("k1", "d1", "k2", "d2", "R", "T")
MONO_KEYS = ("k", "d", "r", "t")
MONO_CUSTOM_KEYS = ("K_matrix", "Dist", "r_vecs", "t_vecs")
# depth4.py:89-104 validates these 9 before building rectification maps
DEPTH_REQUIRED_KEYS = ("mtx1", "dist1", "mtx2", "dist2", "R1", "R2", "P1", "P2", "Q")


@dataclasses.dataclass
class StereoParams:
    """Full stereo rig parameterization (rectified)."""

    mtx1: np.ndarray  # (3,3) left intrinsics
    dist1: np.ndarray  # (1,k) left distortion, k in {4,5,8,12,14}
    mtx2: np.ndarray
    dist2: np.ndarray
    R: np.ndarray  # (3,3) right-from-left rotation
    T: np.ndarray  # (3,1) translation (same units as calibration target)
    E: Optional[np.ndarray] = None  # essential
    F: Optional[np.ndarray] = None  # fundamental
    R1: Optional[np.ndarray] = None  # rectifying rotations
    R2: Optional[np.ndarray] = None
    P1: Optional[np.ndarray] = None  # (3,4) rectified projections
    P2: Optional[np.ndarray] = None
    Q: Optional[np.ndarray] = None  # (4,4) disparity-to-depth

    @property
    def baseline(self) -> float:
        """Baseline length in calibration units (reference: calib1_3.py:354-355)."""
        return float(np.linalg.norm(self.T))

    def save(self, path: str) -> None:
        d = {k: v for k, v in dataclasses.asdict(self).items() if v is not None}
        np.savez(path, **d)

    @staticmethod
    def load(path: str) -> "StereoParams":
        d = np.load(path)
        if all(k in d.files for k in STEREO_FULL_KEYS[:6]):
            kw = {k: d[k] for k in d.files if k in {f.name for f in dataclasses.fields(StereoParams)}}
            return StereoParams(**kw)
        if all(k in d.files for k in STEREO_RAW_KEYS):
            return StereoParams(
                mtx1=d["k1"], dist1=np.atleast_2d(d["d1"]),
                mtx2=d["k2"], dist2=np.atleast_2d(d["d2"]),
                R=d["R"], T=d["T"].reshape(3, 1),
            )
        raise ValueError(f"{path}: unrecognized stereo NPZ schema, keys={sorted(d.files)}")

    def validate_for_depth(self) -> None:
        """Mirror depth4.py:89-104's 9-key check before map computation."""
        missing = [k for k in DEPTH_REQUIRED_KEYS if getattr(self, k, None) is None]
        if missing:
            raise KeyError(f"stereo params missing keys required for depth: {missing}")


def inspect(path: str) -> Dict[str, tuple]:
    """Key/shape dump (reference: inspect_calibration_file.py:3-22)."""
    d = np.load(path)
    return {k: tuple(d[k].shape) for k in d.files}


def describe(path: str) -> str:
    """Human-readable parameter report (reference: readPar.py:54-95)."""
    d = np.load(path)
    lines = [f"Calibration file: {path}", "=" * 60]
    for k in d.files:
        a = d[k]
        lines.append(f"\n{k}  shape={a.shape} dtype={a.dtype}")
        if a.size <= 16:
            lines.append(np.array2string(a, precision=6, suppress_small=True))
    if "T" in d.files:
        lines.append(f"\nBaseline |T| = {np.linalg.norm(d['T']):.6f}")
    if "Q" in d.files and abs(d["Q"][3, 2]) > 1e-12:
        lines.append(f"Rectified focal (Q[2,3]) = {d['Q'][2, 3]:.4f}")
        lines.append(f"Baseline from Q = {1.0 / abs(d['Q'][3, 2]):.6f}")
    return "\n".join(lines)
