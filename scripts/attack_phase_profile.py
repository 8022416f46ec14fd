#!/usr/bin/env python
"""Phase-profile a single-instance HQC key recovery (VERDICT round-3 #5).

Measures where the attack's wall time goes — periodic LDPC decodes vs
raw oracle probes vs host control flow — for any parameter set / decode
backend.  The round-3 open question: the HQC-256 attack path keeps the
dynamic-roll kernel-free XLA circulant decode because "decodes are <5% of
wall", but that share had only been measured for timing runs at HQC-128.
This instruments an actual HQC-256 recovery.

Phases:
- decode:  decoder.decode() wall (host array building + device call +
           result fetch)
- oracle:  HqcOracle._raw / FastCiphertextState batched probes (the
           idealized fast-oracle spectrum updates, host numpy)
- other:   everything else (search control flow, bookkeeping)

Usage:
    python scripts/attack_phase_profile.py --param-set 256 \
        --decode-backend circulant --out artifacts/hqc256_decode_share.json
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
    ap.add_argument("--param-set", default="256")
    ap.add_argument("--code-weight", type=int, default=30)
    ap.add_argument("--decode-every", type=int, default=100)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--decode-backend", default="circulant",
                    choices=["general", "padded", "circulant"])
    ap.add_argument("--platform", default="default", choices=["cpu", "default"])
    ap.add_argument("--max-oracle-calls", type=int, default=None)
    ap.add_argument("--p-bucket", type=int, default=None,
                    help="override MaskedCirculantCheckDecoder.P_BUCKET "
                         "(1 = no compile-shape bucketing) for ablations")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    logging.basicConfig(level=logging.WARNING)

    import sca_ldpc_tpu.models.hqc.attack as atk
    from sca_ldpc_tpu.utils import (
        enable_persistent_compilation_cache,
        make_random_state,
    )

    enable_persistent_compilation_cache()

    acc = {"decode": 0.0, "oracle": 0.0, "n_decodes": 0, "n_raw": 0}

    decoder_cls = {
        "circulant": atk.MaskedCirculantCheckDecoder,
        "padded": atk.PaddedCheckDecoder,
        "general": atk.CheckDecoder,
    }[args.decode_backend]

    if args.p_bucket is not None:
        atk.MaskedCirculantCheckDecoder.P_BUCKET = args.p_bucket

    orig_decode = decoder_cls.decode

    def timed_decode(self, *a, **k):
        t0 = time.perf_counter()
        try:
            return orig_decode(self, *a, **k)
        finally:
            acc["decode"] += time.perf_counter() - t0
            acc["n_decodes"] += 1

    decoder_cls.decode = timed_decode

    orig_raw = atk.HqcOracle._raw

    def timed_raw(self, *a, **k):
        t0 = time.perf_counter()
        try:
            return orig_raw(self, *a, **k)
        finally:
            acc["oracle"] += time.perf_counter() - t0
            acc["n_raw"] += 1

    atk.HqcOracle._raw = timed_raw

    # batched candidate probes bypass _raw (oracle_fast.probe_bits)
    orig_qc = atk.HqcOracle.query_candidates

    def timed_qc(self, *a, **k):
        t0 = time.perf_counter()
        try:
            return orig_qc(self, *a, **k)
        finally:
            acc["oracle"] += time.perf_counter() - t0

    atk.HqcOracle.query_candidates = timed_qc

    t0 = time.time()
    ok, tracking = atk.simulate_hqc_idealized_oracle(
        make_random_state(args.seed),
        args.decode_every,
        args.code_weight,
        None,
        0.0,
        args.param_set,
        max_oracle_calls=args.max_oracle_calls,
        decode_backend=args.decode_backend,
    )
    wall = time.time() - t0

    # query_candidates wraps per-candidate _amplify loops that call _raw
    # only via the batched path; _raw time accumulated inside a timed
    # query_candidates window would double-count — but the fast backend's
    # batched probes never reach _raw, so the two accumulators are
    # disjoint by construction.
    decode_share = acc["decode"] / wall
    oracle_share = acc["oracle"] / wall
    artifact = {
        "experiment": "hqc_attack_phase_profile",
        "param_set": args.param_set,
        "code_weight": args.code_weight,
        "decode_every": args.decode_every,
        "decode_backend": args.decode_backend,
        "p_bucket": atk.MaskedCirculantCheckDecoder.P_BUCKET,
        "platform": args.platform,
        "seed": args.seed,
        "success": bool(ok),
        "wall_seconds": round(wall, 2),
        "decode_seconds": round(acc["decode"], 2),
        "oracle_seconds": round(acc["oracle"], 2),
        "other_seconds": round(wall - acc["decode"] - acc["oracle"], 2),
        "decode_share": round(decode_share, 4),
        "oracle_share": round(oracle_share, 4),
        "num_decodes": acc["n_decodes"],
        "num_raw_queries": acc["n_raw"],
        "oracle_calls": tracking.num_oracle_calls,
        "seconds_per_decode": round(acc["decode"] / max(acc["n_decodes"], 1), 3),
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact, indent=1))


if __name__ == "__main__":
    main()
