#!/usr/bin/env python
"""End-to-end HQC key recovery through the MEASURED timing channel.

Runs ``simulate_hqc_idealized_oracle`` with ``oracle_backend="timing"``:
every oracle decision comes from differential cycle-timed decapsulations of
the native HQC implementation (the rejection-sampling side channel the
reference only characterizes, hqc_eval_oracle.py / hqc.rs:175-200 — it never
drives its attack from it).  Emits a JSON artifact with the calibration,
decision counts, physical decapsulation counts, live accuracy vs ground
truth, and wall time.

Example (the BASELINE.md artifact run):
    python scripts/timing_attack.py --out artifacts/hqc128_timing_attack.json \
        --key-file fixtures/test-hqc128.key --seed 1 --measure 64
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
    ap.add_argument("--out", required=True, help="JSON artifact path")
    ap.add_argument("--csv", default=None, help="optional stats CSV (appended)")
    ap.add_argument("--key-file", default="fixtures/test-hqc128.key")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--param-set", default="128")
    ap.add_argument("--code-weight", type=int, default=20)
    ap.add_argument("--decode-every", type=int, default=50)
    ap.add_argument("--measure", type=int, default=64,
                    help="cycle-timed decapsulations per class per decision")
    ap.add_argument("--profile-log2", type=int, default=14)
    ap.add_argument("--calibration-trials", type=int, default=150)
    ap.add_argument("--max-oracle-calls", type=int, default=None)
    ap.add_argument("--pt-target", type=int, default=3,
                    help="extra seed expansions required of the attack "
                         "plaintext (3 is the maximum this sampler can "
                         "produce: extras are Binomial(3, ~0.18))")
    ap.add_argument("--decode-backend", default="circulant",
                    choices=["general", "padded", "circulant"])
    ap.add_argument("--platform", default="default", choices=["cpu", "default"])
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")

    from sca_ldpc_tpu.models.hqc import simulate_hqc_idealized_oracle
    from sca_ldpc_tpu.utils import (
        enable_persistent_compilation_cache,
        make_random_state,
    )

    enable_persistent_compilation_cache()

    t0 = time.time()
    ok, tracking = simulate_hqc_idealized_oracle(
        make_random_state(args.seed),
        args.decode_every,
        args.code_weight,
        args.key_file,
        0.0,
        args.param_set,
        max_oracle_calls=args.max_oracle_calls,
        oracle_backend="timing",
        decode_backend=args.decode_backend,
        timing_measure=args.measure,
        timing_profile_measurements=2**args.profile_log2,
        timing_calibration_trials=args.calibration_trials,
        timing_pt_target=args.pt_target,
    )
    wall = time.time() - t0

    channel = tracking.timing_channel
    acc_f, acc_s = channel.empirical_accuracy()
    stats = tracking.decoder_stats[-1] if tracking.decoder_stats else {}
    artifact = {
        "experiment": "hqc_timing_attack",
        "param_set": args.param_set,
        "key_file": args.key_file,
        "seed": args.seed,
        "code_weight": args.code_weight,
        "decode_every": args.decode_every,
        "timing_measure": args.measure,
        "pt_target": args.pt_target,
        "profile_measurements": 2**args.profile_log2,
        "calibrated_epsilon": list(tracking.params.EPSILON),
        "success": bool(ok),
        "wall_seconds": round(wall, 1),
        "oracle_decisions": tracking.num_oracle_calls,
        "timed_decapsulations": channel.num_decaps,
        "channel_measurements": channel.num_measurements,
        "live_accuracy_fail": acc_f,
        "live_accuracy_success": acc_s,
        "decoder_stats_last": {k: (bool(v) if isinstance(v, bool) else v)
                               for k, v in stats.items()},
        "decode_backend": args.decode_backend,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))

    if args.csv:
        df = tracking.decoder_stats_data_frame(label="timing")
        header = not os.path.exists(args.csv)
        df.to_csv(args.csv, mode="w" if header else "a", index=False,
                  header=header)


if __name__ == "__main__":
    main()
