"""TPU-side 3D rendering: point splatting with a z-buffer, as one jit.

The reference's live view is an Open3D/OpenGL window (visualizer.py:14-38).
This environment has no GL, so the live window renders ITS OWN frames: the
cloud/mesh is projected and z-buffered on the TPU (scatter-min depth
resolve — the same deterministic claim trick the scalable TSDF uses), and
the resulting RGB frame is shown through the same cv2 windowing the depth
pipeline uses (pipeline/live.py). Orbit-camera math stays host-side.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_FAR = np.float32(1e30)  # numpy: no device op at import time


@partial(jax.jit, static_argnames=("height", "width", "splat"))
def render_points(
    points: jax.Array,
    colors: jax.Array,
    valid: jax.Array,
    view: jax.Array,
    focal: float,
    height: int = 720,
    width: int = 960,
    splat: int = 2,
    background: float = 0.08,
) -> jax.Array:
    """Project + z-buffer splat a masked cloud. Returns (H, W, 3) f32 RGB.

    view: (4, 4) camera_from_world. splat: points cover splat x splat
    pixels (2 keeps moderate clouds watertight on screen).
    """
    H, W = height, width
    p = jnp.asarray(points, jnp.float32)
    cam = p @ view[:3, :3].T + view[:3, 3]
    z = cam[:, 2]
    ok = jnp.asarray(valid, bool) & (z > 1e-3)
    zc = jnp.maximum(z, 1e-3)
    u = focal * cam[:, 0] / zc + (W - 1) / 2.0
    v = focal * cam[:, 1] / zc + (H - 1) / 2.0
    ui = jnp.floor(u).astype(jnp.int32)
    vi = jnp.floor(v).astype(jnp.int32)

    col = jnp.asarray(colors, jnp.float32)
    if col.ndim == 1:
        col = jnp.repeat(col[:, None], 3, axis=1)

    zbuf = jnp.full((H * W + 1,), _FAR)
    img = jnp.full((H * W + 1, 3), jnp.float32(background))
    for du in range(splat):
        for dv in range(splat):
            uu = ui + du
            vv = vi + dv
            inb = ok & (uu >= 0) & (uu < W) & (vv >= 0) & (vv < H)
            pix = jnp.where(inb, vv * W + uu, H * W)
            zbuf = zbuf.at[pix].min(jnp.where(inb, z, _FAR))
    # winners write color; ties resolve by scatter order (deterministic)
    for du in range(splat):
        for dv in range(splat):
            uu = ui + du
            vv = vi + dv
            inb = ok & (uu >= 0) & (uu < W) & (vv >= 0) & (vv < H)
            pix = jnp.where(inb, vv * W + uu, H * W)
            won = inb & (z <= zbuf[pix] * (1.0 + 1e-6))
            pixw = jnp.where(won, pix, H * W)
            img = img.at[pixw].set(col)
    return img[:-1].reshape(H, W, 3)


def orbit_view(target, distance: float, azim_deg: float, elev_deg: float
               ) -> np.ndarray:
    """(4,4) camera_from_world orbiting `target`: the host-side stand-in
    for Open3D's view-control trackball."""
    az = np.deg2rad(azim_deg)
    el = np.deg2rad(elev_deg)
    t = np.asarray(target, np.float64)
    # camera position on the orbit sphere
    eye = t + distance * np.array([np.cos(el) * np.sin(az),
                                   np.sin(el),
                                   -np.cos(el) * np.cos(az)])
    fwd = t - eye
    fwd /= np.linalg.norm(fwd)
    up = np.array([0.0, -1.0, 0.0])  # y-down camera convention
    right = np.cross(fwd, up)
    nr = np.linalg.norm(right)
    if nr < 1e-9:
        right = np.array([1.0, 0.0, 0.0])
    else:
        right /= nr
    dn = np.cross(fwd, right)
    R = np.stack([right, dn, fwd])  # world -> camera rows
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = -R @ eye
    return T
