#!/usr/bin/env python
"""HQC attack-simulation sweep driver.

Replaces the reference's shell-level sweep (run-parallel-hqc-simulation.sh:
one process per (label, weight) config, `wait -n` throttling, per-config log
files used as resume markers).  Differences by design:

- Configs run sequentially in ONE process: a TPU is single-tenant (and in
  this environment every Python process claims it), and the attack's decode
  batches already saturate the chip; host-level parallelism would only
  contend.  Multi-host scale-out = run one sweep per host with disjoint
  --labels and merge CSVs.
- Resume markers are per-config .done files; stats append to one CSV
  (same schema as the reference, readable by viz/).

Example (the reference's default sweep, scaled down):
    python scripts/sweep_hqc.py --csv sweep.csv --param-set 256 \
        --weights 20 30 40 50 60 --labels $(seq 1 100) --decode-every 100
"""

import argparse
import logging
import os
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logger = logging.getLogger("sweep")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", required=True, help="output CSV (appended)")
    ap.add_argument("--param-set", default="256")
    ap.add_argument("--weights", type=int, nargs="+", default=[20, 30, 40, 50, 60])
    ap.add_argument("--labels", nargs="+", default=[str(i) for i in range(1, 101)])
    ap.add_argument("--decode-every", type=int, default=100)
    ap.add_argument("--key-file", default=None)
    ap.add_argument("--error-rate", type=float, default=0.0)
    ap.add_argument("--seed-base", type=int, default=0)
    ap.add_argument("--max-oracle-calls", type=int, default=None)
    ap.add_argument("--oracle-backend", default="fast", choices=["fast", "native"])
    ap.add_argument("--decode-backend", default="general",
                    choices=["general", "padded", "circulant"],
                    help="'padded' = checks-only decode at a fixed "
                         "capacity (one compile shape); 'circulant' = "
                         "single-compile-shape masked full-circulant "
                         "decode; combine either with --platform default "
                         "to decode on the TPU")
    ap.add_argument("--state-dir", default=None,
                    help="resume-marker directory (default: <csv>.state)")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "default"],
                    help="JAX platform for the decode batches.  With the "
                         "'general' decode backend, 'cpu' (default) avoids "
                         "per-dispatch accelerator latency and per-bucket "
                         "recompiles; with 'circulant', 'default' (TPU) is "
                         "fastest.")
    ap.add_argument("--batch-size", type=int, default=1,
                    help=">1 runs that many same-weight labels as "
                         "concurrent attack instances with their decodes "
                         "merged into single batched device calls "
                         "(simulate_hqc_attacks_batched) — the fast path "
                         "for the reference's 100-label default sweep")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    logging.getLogger("sca_ldpc_tpu").setLevel(logging.WARNING)

    from sca_ldpc_tpu.models.hqc import simulate_hqc_idealized_oracle
    from sca_ldpc_tpu.utils import (
        enable_persistent_compilation_cache,
        make_random_state,
    )

    enable_persistent_compilation_cache()

    state_dir = args.state_dir or (args.csv + ".state")
    os.makedirs(state_dir, exist_ok=True)

    configs = [(label, w) for label in args.labels for w in args.weights]
    logger.info(f"{len(configs)} configs; resume markers in {state_dir}")

    def marker_path(label, weight):
        return os.path.join(state_dir, f"{args.param_set}-{label}-w{weight}.done")

    def drop_stale_rows(label, weight):
        if not os.path.exists(args.csv):
            return
        import pandas as pd

        df0 = pd.read_csv(args.csv)
        mask = (df0["label"].astype(str) == str(label)) & (df0["weight"] == weight)
        if mask.any():
            logger.warning(f"dropping {mask.sum()} stale rows for {label} w={weight}")
            df0[~mask].to_csv(args.csv, index=False)

    def append_result(label, weight, ok, tracking, wall):
        df = tracking.decoder_stats_data_frame(label=label)
        header = not os.path.exists(args.csv)
        df.to_csv(args.csv, mode="w" if header else "a", index=False, header=header)
        with open(marker_path(label, weight), "w") as f:
            f.write(f"success={ok} wall={wall:.1f}\n")

    if args.batch_size > 1:
        from sca_ldpc_tpu.models.hqc.batched import simulate_hqc_attacks_batched

        for weight in args.weights:
            todo = [l for l in args.labels
                    if not os.path.exists(marker_path(l, weight))]
            done_n = len(args.labels) - len(todo)
            if done_n:
                logger.info(f"w={weight}: {done_n} labels already done")
            for i in range(0, len(todo), args.batch_size):
                group = todo[i : i + args.batch_size]
                for label in group:
                    drop_stale_rows(label, weight)
                seeds = [
                    args.seed_base
                    + zlib.crc32(f"{label}-{weight}".encode()) % (2**31)
                    for label in group
                ]
                t0 = time.time()
                results, calls = simulate_hqc_attacks_batched(
                    seeds, args.decode_every, weight,
                    error_rate=args.error_rate, param_set=args.param_set,
                    max_oracle_calls=args.max_oracle_calls,
                    oracle_backend=args.oracle_backend,
                    decode_backend=args.decode_backend,
                )
                wall = time.time() - t0
                for label, res in zip(group, results):
                    if res is None:
                        logger.error(f"{label} w={weight}: instance died")
                        continue
                    ok, tracking = res
                    append_result(label, weight, ok, tracking, wall)
                n_ok = sum(1 for r in results if r and r[0])
                logger.info(
                    f"w={weight} batch {group[0]}..{group[-1]}: "
                    f"{n_ok}/{len(group)} recovered, {calls} batched decode "
                    f"calls, wall={wall:.1f}s"
                )
        return

    for i, (label, weight) in enumerate(configs):
        marker = os.path.join(state_dir, f"{args.param_set}-{label}-w{weight}.done")
        if os.path.exists(marker):
            logger.info(f"[{i+1}/{len(configs)}] {label} w={weight}: done, skipping")
            continue
        if os.path.exists(args.csv):
            # a crash between CSV append and marker write leaves partial rows;
            # drop them before re-running the config
            import pandas as pd

            df0 = pd.read_csv(args.csv)
            mask = (df0["label"].astype(str) == str(label)) & (df0["weight"] == weight)
            if mask.any():
                logger.warning(f"dropping {mask.sum()} stale rows for {label} w={weight}")
                df0[~mask].to_csv(args.csv, index=False)
        seed = args.seed_base + zlib.crc32(f"{label}-{weight}".encode()) % (2**31)
        t0 = time.time()
        ok, tracking = simulate_hqc_idealized_oracle(
            make_random_state(seed),
            args.decode_every,
            weight,
            args.key_file,
            args.error_rate,
            args.param_set,
            max_oracle_calls=args.max_oracle_calls,
            oracle_backend=args.oracle_backend,
            decode_backend=args.decode_backend,
        )
        df = tracking.decoder_stats_data_frame(label=label)
        header = not os.path.exists(args.csv)
        df.to_csv(args.csv, mode="w" if header else "a", index=False, header=header)
        with open(marker, "w") as f:
            f.write(f"success={ok} wall={time.time()-t0:.1f}\n")
        logger.info(
            f"[{i+1}/{len(configs)}] {label} w={weight}: success={ok} "
            f"oracle_calls={tracking.num_oracle_calls} wall={time.time()-t0:.1f}s"
        )


if __name__ == "__main__":
    main()
