"""Single-measurement point-op benchmark, run as its own process.

bench.py shells out here for the large-N normal-estimation extras: the
axon TPU backend intermittently rejects (InvalidArgument) loading a
second Pallas executable into a process that already ran one with a
lane-padded layout, while one-program-per-process runs are reliable.
Prints one JSON line: {"ms": <avg over reps>}.

Reference scale target: test/gpu-performance.py:23-46 (10M-point ops).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("op", choices=["normals", "voxel"])
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--radius", type=float, default=0.02)
    ap.add_argument("--grid", type=int, default=52)
    ap.add_argument("--cap", type=int, default=16)
    ap.add_argument("--voxel-size", type=float, default=0.05)
    ap.add_argument("--capacity", type=int, default=1 << 14)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import numpy as np
    import jax

    # sitecustomize imports jax and registers the axon backend before this
    # module runs, so JAX_PLATFORMS alone is not honored — mirror the env
    # var into the config (same pattern as cli.py / conftest.py)
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    # same sitecustomize pitfall for the cache dir: jax was imported before
    # the env var above was set, so route it through jax.config
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp

    from recon3d_tpu.utils.types import PointCloud

    rng = np.random.RandomState(0)
    pc = PointCloud(points=jnp.asarray(rng.rand(args.n, 3), jnp.float32),
                    valid=jnp.ones((args.n,), bool))
    if args.op == "normals":
        from recon3d_tpu.pointcloud.normals import estimate_normals
        f = lambda p: estimate_normals(p, radius=args.radius, max_nn=30,
                                       grid_size=args.grid,
                                       cell_capacity=args.cap)
        sync = lambda o: jnp.sum(o.normals)
    else:
        # the reference's only benchmark: CUDA voxel downsample of 10M
        # random unit-cube points (test/gpu-performance.py:23-46)
        from recon3d_tpu.pointcloud.voxel import voxel_downsample
        f = jax.jit(lambda p: voxel_downsample(p, args.voxel_size,
                                               capacity=args.capacity))
        sync = lambda o: jnp.sum(o.valid)
    _ = float(sync(f(pc)))  # compile + warm
    t0 = time.perf_counter()
    for _i in range(args.reps):
        out = f(pc)
    _ = float(sync(out))
    ms = (time.perf_counter() - t0) / args.reps * 1e3
    print(json.dumps({"ms": round(ms, 1)}))


if __name__ == "__main__":
    main()
