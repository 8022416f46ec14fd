#!/usr/bin/env python
"""Kyber-768 recovery-rate vs oracle-accuracy curve.

The paper's Kyber experiment: per oracle accuracy, how many coefficient
errors remain after decoding.  Sweeps the pattern database's supported
accuracies and writes a CSV.

    python scripts/kyber_curve.py --out kyber_curve.csv --runs 4
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="kyber_curve.csv")
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--accuracies", type=float, nargs="+", default=[0.9, 0.95, 0.995])
    ap.add_argument("--sum-weight", type=int, default=6)
    ap.add_argument("--check-blocks", type=int, default=2)
    ap.add_argument("--iterations", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from sca_ldpc_tpu.models.kyber import simulate_kyber_attack
    from sca_ldpc_tpu.utils import make_random_state

    import pandas as pd

    rows = []
    for acc in args.accuracies:
        t0 = time.time()
        results = simulate_kyber_attack(
            make_random_state(args.seed),
            accuracy=acc,
            num_patterns=3,
            num_patterns_sum=3,
            sum_weight=args.sum_weight,
            check_blocks=args.check_blocks,
            iterations=args.iterations,
            runs=args.runs,
        )
        for r in results:
            rows.append({"accuracy": acc, **r})
        avg = sum(r["correct_coefficients"] for r in results) / len(results)
        rec = sum(r["recovered"] for r in results)
        print(f"accuracy {acc}: avg correct {avg:.1f}/768, "
              f"full recoveries {rec}/{len(results)}, {time.time()-t0:.1f}s")

    pd.DataFrame(rows).to_csv(args.out, index=False)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
