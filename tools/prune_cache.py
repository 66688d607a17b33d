#!/usr/bin/env python
"""Prune .jax_cache to entries the current code actually loads.

The committed compile cache accretes dead keys every time kernels change
(round 3 hit 1.4 GB / ~3000 blobs). Rather than tracking keys through
logs, this uses atimes: the filesystem mounts relatime, so any cache
entry READ or WRITTEN since a cutoff carries atime/mtime newer than it.
Run the full workload set first (test suite on CPU, warm_cache
--streaming + bench.py on the TPU, dryrun_multichip), then:

    python tools/prune_cache.py --cutoff "2026-08-20 07:00" [--apply]

Without --apply it only reports. With --apply it deletes stale entries
and stages the deletions (git rm --cached for tracked ones).
"""
import argparse
import datetime as dt
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CACHE = os.path.join(_REPO, ".jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cutoff", required=True,
                    help='e.g. "2026-08-20 07:00" (local time)')
    ap.add_argument("--apply", action="store_true")
    args = ap.parse_args()
    cutoff = dt.datetime.fromisoformat(args.cutoff).timestamp()

    keep, stale, keep_b, stale_b = [], [], 0, 0
    for name in os.listdir(_CACHE):
        p = os.path.join(_CACHE, name)
        if not os.path.isfile(p):
            continue
        st = os.stat(p)
        if max(st.st_atime, st.st_mtime) >= cutoff:
            keep.append(name)
            keep_b += st.st_size
        else:
            stale.append(name)
            stale_b += st.st_size
    print(f"keep:  {len(keep):5d} entries, {keep_b / 1e6:8.1f} MB")
    print(f"stale: {len(stale):5d} entries, {stale_b / 1e6:8.1f} MB")
    if not args.apply:
        print("(dry run; pass --apply to delete)")
        return
    for name in stale:
        os.unlink(os.path.join(_CACHE, name))
    # drop deleted blobs from the index in batches
    rel = [os.path.join(".jax_cache", n) for n in stale]
    for i in range(0, len(rel), 500):
        subprocess.run(["git", "rm", "-q", "--cached", "--ignore-unmatch",
                        *rel[i:i + 500]], cwd=_REPO, check=True)
    print(f"deleted {len(stale)} stale entries "
          f"({stale_b / 1e6:.1f} MB) and staged the removals")


if __name__ == "__main__":
    main()
