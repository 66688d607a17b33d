#!/usr/bin/env python
"""Headline-style fps of the full 1080p frame program per matcher mode.

Same timing protocol as bench.py (60 queued iterations, one device
round-trip at the end) so numbers are directly comparable to the headline.

Usage: python tools/exp_headline_fps.py sgm3 sgm8:2 sgm8:4 ...
(mode[:p2_mult])
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

bench._enable_compile_cache()


def main():
    specs = sys.argv[1:] or ["sgm3", "sgm8:2"]
    for spec in specs:
        mode, _, mult = spec.partition(":")
        p2_mult = float(mult) if mult else None
        frame, args, _ = bench.build_headline(mode=mode, p2_mult=p2_mult)
        t0 = time.perf_counter()
        out = frame(*args)
        _ = float(out[-1])
        compile_s = time.perf_counter() - t0
        n = 60
        t0 = time.perf_counter()
        for _i in range(n):
            out = frame(*args)
        _ = float(out[-1])
        dt = time.perf_counter() - t0
        print(f"{spec:12s} fps {n / dt:7.2f}  ms/frame {dt / n * 1e3:7.2f}"
              f"  (compile {compile_s:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
