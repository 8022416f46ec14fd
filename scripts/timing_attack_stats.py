#!/usr/bin/env python
"""Repeatability statistics for the timing-channel key recovery (VERDICT #3).

Round 2 produced ONE measured-timing key recovery
(artifacts/hqc128_timing_attack.json).  This driver runs a configurable set
of further recoveries — different seeds, fresh keys, HQC-192, and the
TPU circulant decode backend — writing one JSON artifact per run plus a
summary table, to settle:

- repeatability of the end-to-end recovery (success rate, wall, decaps);
- whether the success-class calibration is systematically optimistic
  (round-2 weak #5: calibrated EPSILON (0.960, 0.993) vs live (0.971,
  0.955) on a single sample was uninformative).

Each run uses a FRESH keypair (no --key-file), so the statistics cover key
variation as well as seed variation.  Runs are sequential in one process;
the timing channel needs a quiet machine (CLAUDE.md), so do not run this
concurrently with sweeps or kernel work.

Usage:
    python scripts/timing_attack_stats.py --out-dir artifacts/timing_stats
"""

import argparse
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logger = logging.getLogger("timing_stats")

# (name, param_set, code_weight, decode_every, seed, decode_backend, platform)
DEFAULT_RUNS = [
    ("128-s2-cpu", "128", 20, 50, 2, "general", "cpu"),
    ("128-s3-cpu", "128", 20, 50, 3, "general", "cpu"),
    ("128-s4-tpu", "128", 20, 50, 4, "circulant", "default"),
    ("128-s5-tpu", "128", 20, 50, 5, "circulant", "default"),
    ("192-s6-tpu", "192", 30, 100, 6, "circulant", "default"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="artifacts/timing_stats")
    ap.add_argument("--runs", nargs="+", default=None,
                    help="subset of run names (default: all)")
    ap.add_argument("--measure", type=int, default=64)
    ap.add_argument("--profile-log2", type=int, default=14)
    ap.add_argument("--calibration-trials", type=int, default=150)
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    logging.getLogger("sca_ldpc_tpu").setLevel(logging.WARNING)

    runs = [r for r in DEFAULT_RUNS
            if args.runs is None or r[0] in args.runs]

    # Platform must be decided before the first JAX backend init; mixed-
    # platform run sets fall back to the default platform for all runs.
    platforms = {r[6] for r in runs}
    if platforms == {"cpu"}:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from sca_ldpc_tpu.models.hqc import simulate_hqc_idealized_oracle
    from sca_ldpc_tpu.utils import (
        enable_persistent_compilation_cache,
        make_random_state,
    )

    enable_persistent_compilation_cache()

    summary = []
    for (name, pset, weight, decode_every, seed, backend, _platform) in runs:
        out = os.path.join(args.out_dir, f"timing_{name}.json")
        if os.path.exists(out):
            logger.info(f"{name}: artifact exists, skipping")
            summary.append(json.load(open(out)))
            continue
        logger.info(f"=== {name}: param_set={pset} seed={seed} "
                    f"decode={backend} ===")
        t0 = time.time()
        ok, tracking = simulate_hqc_idealized_oracle(
            make_random_state(seed),
            decode_every,
            weight,
            None,  # fresh keypair per run
            0.0,
            pset,
            oracle_backend="timing",
            decode_backend=backend,
            timing_measure=args.measure,
            timing_profile_measurements=2**args.profile_log2,
            timing_calibration_trials=args.calibration_trials,
        )
        wall = time.time() - t0
        channel = tracking.timing_channel
        acc_f, acc_s = channel.empirical_accuracy()
        stats = tracking.decoder_stats[-1] if tracking.decoder_stats else {}
        artifact = {
            "experiment": "hqc_timing_attack",
            "run": name,
            "param_set": pset,
            "seed": seed,
            "key": "fresh",
            "code_weight": weight,
            "decode_every": decode_every,
            "timing_measure": args.measure,
            "profile_measurements": 2**args.profile_log2,
            "calibrated_epsilon": list(tracking.params.EPSILON),
            "success": bool(ok),
            "wall_seconds": round(wall, 1),
            "oracle_decisions": tracking.num_oracle_calls,
            "timed_decapsulations": channel.num_decaps,
            "live_accuracy_fail": acc_f,
            "live_accuracy_success": acc_s,
            "decoder_stats_last": {k: (bool(v) if isinstance(v, bool) else v)
                                   for k, v in stats.items()},
            "decode_backend": backend,
        }
        with open(out, "w") as f:
            json.dump(artifact, f, indent=1)
        summary.append(artifact)
        logger.info(f"{name}: success={ok} wall={wall:.0f}s "
                    f"eps={artifact['calibrated_epsilon']} "
                    f"live=({acc_f:.3f},{acc_s:.3f})")

    with open(os.path.join(args.out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print("\nrun            set  ok   wall(s)  decisions  decaps     "
          "eps_cal(f,s)      live(f,s)")
    for a in summary:
        eps = a["calibrated_epsilon"]
        print(f"{a.get('run', '?'):14s} {a['param_set']:4s} "
              f"{'Y' if a['success'] else 'N'}  {a['wall_seconds']:8.1f} "
              f"{a['oracle_decisions']:9d}  {a['timed_decapsulations']:9d} "
              f"({eps[0]:.3f},{eps[1]:.3f})  "
              f"({a['live_accuracy_fail']:.3f},{a['live_accuracy_success']:.3f})")


if __name__ == "__main__":
    main()
