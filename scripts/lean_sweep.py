#!/usr/bin/env python
"""Measure the lean circulant kernel across (group, bf16_rolls, batch, tb)
configurations at HQC-256 (the round-3 kernel-gap experiment, VERDICT #1).

One configuration per process invocation is NOT needed — compiles are cached
per static-arg tuple and each config is measured with bench.bench_tpu's
loop-in-dispatch best-of-3 methodology.  Budget compile time: each new
(group, tb) pair costs a Mosaic compile (~30-90 s at HQC-256).

Usage:
    python scripts/lean_sweep.py --configs g6 g6bf g5bf ...
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CONFIGS = {
    # name: (group, bf16_rolls, batch, tb)
    "base": (1, False, 1024, 8),      # round-2 lean structure (p1 fused only)
    "g5": (5, False, 1024, 8),
    "g6": (6, False, 1024, 8),
    "g10": (10, False, 1024, 8),
    "g6bf": (6, True, 1024, 8),
    "g5bf": (5, True, 1024, 8),
    "g10bf": (10, True, 1024, 8),
    "g15bf": (15, True, 1024, 8),
    "g6bf2048": (6, True, 2048, 8),
    "g6bf512": (6, True, 512, 8),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="+", default=["base", "g5", "g6", "g6bf"])
    ap.add_argument("--n", type=int, default=57637)
    ap.add_argument("--weight", type=int, default=30)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--max-iter", type=int, default=30)
    args = ap.parse_args()

    from sca_ldpc_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    from bench import bench_tpu, build_code

    lay = build_code(seed=0, n=args.n, weight=args.weight)
    probs = np.full(lay.n_vars, 0.01, np.float32)

    for name in args.configs:
        group, bf16, batch, tb = CONFIGS[name]
        t0 = time.time()
        try:
            fps, success = bench_tpu(
                lay, probs, batch=batch, steps=args.steps,
                max_iter=args.max_iter, tb=tb, backend="lean",
                lean_group=group, lean_bf16=bf16,
            )
        except Exception as e:
            print(json.dumps({"config": name, "error": str(e)[:300]}),
                  flush=True)
            continue
        print(json.dumps({
            "config": name, "group": group, "bf16_rolls": bf16,
            "batch": batch, "tb": tb, "frames_per_s": round(fps, 1),
            "success": success, "wall_s": round(time.time() - t0, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
