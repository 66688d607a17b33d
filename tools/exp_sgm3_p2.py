"""Can sgm3 (3-direction, 33 fps) beat cv2's full pipeline on ground
truth with a raised P2? Evaluates ndir=3 at P2 multipliers on the bench
scene (vs the analytic disparity, interior mask), plus ndir=4 reference."""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_REPO, ".jax_cache"))

import numpy as np

import bench


def main():
    import jax.numpy as jnp

    from recon3d_tpu.depth import sgm_pallas
    from recon3d_tpu.ops.warp import remap_two_pass_pallas

    bench._enable_compile_cache()
    frame, (jl, jr, jc, plan, jQ), scene = bench.build_headline()
    W, H, D = scene["W"], scene["H"], scene["D"]
    disp_true, mx, my = scene["disp_true"], scene["mx"], scene["my"]

    to8 = lambda a: np.clip(np.round(a), 0, 255).astype(np.uint8)
    wl = to8(np.asarray(remap_two_pass_pallas(jl, plan)))
    wr = to8(np.asarray(remap_two_pass_pallas(jr, plan)))

    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    m_x = int(np.ceil(np.abs(mx - xx).max())) + 2
    m_y = int(np.ceil(np.abs(my - yy).max())) + 2
    interior = np.zeros((H, W), bool)
    interior[m_y:H - m_y, m_x + D:W - m_x] = True

    def rmse_truth(ndir, p2m):
        dd, vv = sgm_pallas.sgm_disparity_pallas(
            jnp.asarray(wl, jnp.float32), jnp.asarray(wr, jnp.float32),
            num_disparities=D, block_size=5, num_directions=ndir,
            p2=float(int(32 * p2m) * 25))
        dd, vv = np.asarray(dd), np.asarray(vv)
        m = vv & (disp_true > 1.0) & interior
        return float(np.sqrt(((dd[m] - disp_true[m]) ** 2).mean())), \
            float(m.mean())

    for ndir, p2m in [(3, 2.0), (3, 3.0), (3, 4.0), (4, 3.0)]:
        t0 = time.perf_counter()
        r, frac = rmse_truth(ndir, p2m)
        print(f"ndir={ndir} P2x{p2m}: rmse_vs_truth={r:.4f} px "
              f"(valid {frac:.3f}) [{time.perf_counter()-t0:.0f}s]",
              flush=True)
    print("cv2 3WAY full-pipeline reference: 1.111 px (BENCH_r03)",
          flush=True)


if __name__ == "__main__":
    main()
