#!/usr/bin/env python
"""Batched multi-instance TIMING attacks (VERDICT round-2 stretch #8).

Runs N independent HQC key recoveries, each driven by the measured
decapsulation-timing channel on its own fresh key, concurrently: the
cycle-timed measurement blocks serialize on eval_oracle.MEASUREMENT_LOCK
(the physical channel is host-global), per-key profiling/calibration runs
per instance, and the periodic LDPC decodes merge into batched device calls
(BatchedCirculantDecodeExecutor).  The run stresses exactly the machinery
the single-instance artifact cannot: concurrent rebases, interleaved
calibrations, and decode batching under timing-driven (certainty-capped,
retraction-capable) check streams.

Usage:
    python scripts/timing_attack_batched.py --seeds 7 8 \
        --out artifacts/timing_stats/timing_batched_2x128.json
"""

import argparse
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--seeds", type=int, nargs="+", default=[7, 8])
    ap.add_argument("--param-set", default="128")
    ap.add_argument("--code-weight", type=int, default=20)
    ap.add_argument("--decode-every", type=int, default=50)
    ap.add_argument("--measure", type=int, default=64)
    ap.add_argument("--profile-log2", type=int, default=14)
    ap.add_argument("--calibration-trials", type=int, default=150)
    ap.add_argument("--decode-backend", default="circulant")
    ap.add_argument("--platform", default="default", choices=["cpu", "default"])
    ap.add_argument("--recal-every", type=int, default=1200)
    ap.add_argument("--recal-trials", type=int, default=20)
    ap.add_argument("--checkpoint-dir", default=None,
                    help="per-instance mid-attack checkpoints; relaunching "
                         "with the same dir resumes killed instances")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    logging.getLogger("sca_ldpc_tpu").setLevel(logging.WARNING)

    from _timing_common import (
        channel_fields,
        start_partial_writer,
        write_json,
    )

    from sca_ldpc_tpu.models.hqc.batched import simulate_hqc_attacks_batched
    from sca_ldpc_tpu.models.hqc.tracking import HqcSimulationTracking
    from sca_ldpc_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    t0 = time.time()
    trackings = []
    orig_init = HqcSimulationTracking.__init__

    def spy_init(self, *a, **kw):
        orig_init(self, *a, **kw)
        trackings.append(self)

    HqcSimulationTracking.__init__ = spy_init

    def run_fields(tracking):
        fields = {"calibrated_epsilon": None}
        calib = getattr(tracking, "timing_calibration", None)
        if calib:
            fields["calibrated_epsilon"] = list(calib["initial_epsilon"])
        fields.update(channel_fields(tracking))
        return fields

    def snapshot():
        return {
            "experiment": "hqc_timing_attack_batched",
            "param_set": args.param_set,
            "instances": len(args.seeds),
            "timing_measure": args.measure,
            "profile_measurements": 2**args.profile_log2,
            "recal_every": args.recal_every,
            "decode_backend": args.decode_backend,
            "wall_seconds": round(time.time() - t0, 1),
            # thread creation order, not seed order — labeled by index only
            "runs": [dict(instance=i, **run_fields(tr))
                     for i, tr in enumerate(list(trackings))],
        }

    stop_partial = start_partial_writer(args.out, snapshot, interval=60)
    try:
        results, batched_calls = simulate_hqc_attacks_batched(
            args.seeds, args.decode_every, args.code_weight,
            param_set=args.param_set,
            oracle_backend="timing",
            decode_backend=args.decode_backend,
            timing_measure=args.measure,
            timing_profile_measurements=2**args.profile_log2,
            timing_calibration_trials=args.calibration_trials,
            timing_recal_every=args.recal_every,
            timing_recal_trials=args.recal_trials,
            checkpoint_dir=args.checkpoint_dir,
        )
    finally:
        stop_partial()
        HqcSimulationTracking.__init__ = orig_init
    wall = time.time() - t0

    runs = []
    for seed, res in zip(args.seeds, results):
        if res is None:
            runs.append({"seed": seed, "success": False, "error": "instance died"})
            continue
        ok, tracking = res
        runs.append(dict(seed=seed, success=bool(ok), **run_fields(tracking)))
    artifact = {
        "experiment": "hqc_timing_attack_batched",
        "param_set": args.param_set,
        "instances": len(args.seeds),
        "timing_measure": args.measure,
        "profile_measurements": 2**args.profile_log2,
        "recal_every": args.recal_every,
        "decode_backend": args.decode_backend,
        "batched_decode_calls": batched_calls,
        "wall_seconds": round(wall, 1),
        "keys_recovered": sum(1 for r in runs if r.get("success")),
        "runs": runs,
    }
    write_json(args.out, artifact)
    print(json.dumps(artifact, indent=1))


if __name__ == "__main__":
    main()
