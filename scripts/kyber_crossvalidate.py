#!/usr/bin/env python
"""Cross-validate the Kyber two-alphabet decoder against an enumeration model
at the paper's operating point.

Round-2 verdict follow-up: the (3 patterns, 3 sum patterns, 2 check blocks)
@ accuracy 0.95 operating point recovers only ~5/16 keys, explained as an
information-budget shortfall (+0.20 bits/coeff margin).  That explanation is
only sound if THIS decoder extracts the budget as well as the reference's
would — otherwise a decoder deficiency is indistinguishable from a budget
shortfall (VERDICT.md weak #4).

This script feeds IDENTICAL posteriors, produced by the exact pipeline used
for artifacts/kyber768_recovery_curve.csv, to:

  (a) ops/qary_special.QarySpecialDecoder (the production min-plus decoder,
      float32), and
  (b) a float64 enumeration-semantics model of the reference's Rust
      DecoderSpecial::min_sum (decoder_special.rs:471-617): the full
      (2B+1)^SW d-value grid per check (SimpleDValueIterator semantics,
      :226-275), counterweight d_sum = -sum(d) (:533-537), min-updates of
      both beta classes, standard variable updates.  The grid reduction is
      vectorized (min is order-independent) but the arithmetic is the
      reference's, in float64.

and reports, per run: correct coefficients under each decoder, full-key
recovery under each, and the per-coefficient agreement between the two.
If the two decoders agree, the 5/16 result is budget, not decoder loss.

Usage:
    python scripts/kyber_crossvalidate.py --runs 16 --out artifacts/kyber_crossvalidation.json
"""

import argparse
import json
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logger = logging.getLogger("kyber_xval")


def _signed_np(v, sign):
    """mult_in_gf on the last axis: reverse where sign < 0 (decoder.rs:164-172)."""
    rev = v[..., ::-1]
    return np.where(np.asarray(sign)[..., None] < 0, rev, v)


class EnumSpecialDecoder:
    """Float64 enumeration-semantics model of DecoderSpecial::min_sum for a
    REGULAR [H'|I] code (every row has exactly SW B-variables; the Kyber
    matrices from gen_ldpc_matrix are regular by construction)."""

    def __init__(self, H, b, bsum, max_iter):
        H = np.asarray(H)
        r, n = H.shape
        n_b = n - r
        self.b, self.bsum, self.max_iter = b, bsum, max_iter
        self.r, self.n_b = r, n_b
        q = 2 * b + 1

        bcols, bsign, sum_col, ssign = [], [], [], []
        for i in range(r):
            nz = np.flatnonzero(H[i])
            bs = nz[nz < n_b]
            ss = nz[nz >= n_b]
            assert len(ss) == 1
            bcols.append(bs)
            bsign.append(H[i, bs])
            sum_col.append(ss[0] - n_b)
            ssign.append(H[i, ss[0]])
        self.sw = sw = len(bcols[0])
        assert all(len(c) == sw for c in bcols), "regular rows required"
        assert bsum == sw * b
        self.bcols = np.array(bcols)  # [r, sw]
        self.bsign = np.array(bsign)
        self.sum_col = np.array(sum_col)  # [r] sum-variable index per row
        self.ssign = np.array(ssign)

        # d_sum per grid cell: axis j+1 of the S tensor is neighbor j's d.
        shape = (q,) * sw
        dsum = np.zeros(shape, dtype=int)
        for j in range(sw):
            idx = np.arange(-b, b + 1).reshape(
                (1,) * j + (q,) + (1,) * (sw - 1 - j)
            )
            dsum = dsum + idx
        self.dsum_flat = (-dsum).reshape(-1)  # counterweight value per config
        self.order = np.argsort(self.dsum_flat, kind="stable")
        sorted_d = self.dsum_flat[self.order]
        # segment boundaries per counterweight value -bsum..bsum (all present)
        self.seg_starts = np.searchsorted(sorted_d, np.arange(-bsum, bsum + 1))
        self.qs = 2 * bsum + 1

    def min_sum(self, channel, channel_sum, clip):
        b, bsum, sw, r, n_b = self.b, self.bsum, self.sw, self.r, self.n_b
        q, qs = 2 * b + 1, self.qs

        def into_llr(p):
            p = np.asarray(p, np.float64)
            with np.errstate(divide="ignore"):
                out = np.log(p.max(axis=-1, keepdims=True)) - np.log(p)
            return np.minimum(out, clip)

        llr_b = into_llr(channel)  # [n_b, q]
        llr_srow = into_llr(channel_sum)[self.sum_col]  # [r, qs] row-ordered

        v2c = _signed_np(llr_b[self.bcols], self.bsign)  # [r, sw, q]
        v2c_sum = _signed_np(llr_srow, self.ssign)  # [r, qs]

        hard_b = np.zeros(n_b, dtype=int)
        hard_sum = np.zeros(r, dtype=int)
        for it in range(1, self.max_iter + 1):
            # --- check update: full d-grid.
            S = np.zeros((r,) + (q,) * sw, np.float64)
            for j in range(sw):
                S = S + v2c[:, j].reshape((r,) + (1,) * j + (q,) + (1,) * (sw - 1 - j))
            S_flat = S.reshape(r, -1)
            S_flat = S_flat + v2c_sum[:, self.dsum_flat + bsum]

            beta = np.empty((r, sw, q), np.float64)
            St = S_flat.reshape((r,) + (q,) * sw)
            for k in range(sw):
                axes = tuple(a + 1 for a in range(sw) if a != k)
                beta[:, k] = St.min(axis=axes) - v2c[:, k]
            beta_sum = (
                np.minimum.reduceat(S_flat[:, self.order], self.seg_starts, axis=1)
                - v2c_sum
            )

            # --- B-variable update.
            c2v_var = _signed_np(beta, self.bsign)  # back to variable domain
            total_b = llr_b.copy()
            np.add.at(total_b, self.bcols.reshape(-1), c2v_var.reshape(-1, q))
            prim = _signed_np(total_b[self.bcols], self.bsign) - beta
            prim = prim - prim.min(axis=-1, keepdims=True)
            v2c = prim

            # --- sum-variable update (degree 1: normalized signed channel).
            total_srow = llr_srow + _signed_np(beta_sum, self.ssign)
            v2c_sum = _signed_np(total_srow, self.ssign) - beta_sum
            v2c_sum = v2c_sum - v2c_sum.min(axis=-1, keepdims=True)

            if it >= self.max_iter:
                hard_b = np.argmin(total_b, axis=-1) - b
                hard_srow = np.argmin(total_srow, axis=-1) - bsum
                hard_sum = np.empty(r, dtype=int)
                hard_sum[self.sum_col] = hard_srow
        return np.concatenate([hard_b, hard_sum])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--accuracy", type=float, default=0.95)
    ap.add_argument("--num-patterns", type=int, default=3)
    ap.add_argument("--num-patterns-sum", type=int, default=3)
    ap.add_argument("--check-blocks", type=int, default=2)
    ap.add_argument("--iterations", type=int, default=10)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    from sca_ldpc_tpu.models.kyber.pipeline import (
        BLOCK_LEN,
        ETA,
        NUM_BLOCKS,
        compute_ssum,
        generate_secret,
        get_channel_probabilities,
        get_decoder,
        simulate_measurements,
        simulate_sum_measurements,
    )
    from sca_ldpc_tpu.models.kyber import gen_ldpc_matrix
    from sca_ldpc_tpu.models.kyber.patterns import (
        coding_from_patterns,
        get_patterns,
    )
    from sca_ldpc_tpu.models.kyber.posterior import posteriors_from_hard
    from sca_ldpc_tpu.models.kyber.pipeline import secret_distribution
    from sca_ldpc_tpu.ops import minplus
    from sca_ldpc_tpu.utils import make_random_state

    rng = make_random_state(args.seed)
    sum_weight = 6
    patterns = get_patterns(ETA, args.accuracy, args.num_patterns,
                            args.num_patterns_sum, sum_weight)
    H = gen_ldpc_matrix(sum_weight, rng, args.check_blocks)
    decoder = get_decoder(sum_weight, H, args.check_blocks, args.iterations)
    enum_dec = EnumSpecialDecoder(H, b=ETA, bsum=sum_weight * ETA,
                                  max_iter=args.iterations)

    prior_single = secret_distribution(1)
    prior_sum = secret_distribution(sum_weight)
    coding_single = coding_from_patterns(patterns["pattern"], 1)
    coding_sum = coding_from_patterns(patterns["pattern_sum"], sum_weight)

    n_b = BLOCK_LEN * NUM_BLOCKS
    rows = []
    for run in range(args.runs):
        s = generate_secret(rng=rng)
        ssum = compute_ssum(s, H, args.check_blocks)
        s_flat = np.array(s).reshape(-1)
        meas = simulate_measurements(s_flat, patterns["pattern"], args.accuracy, rng)
        meas_sum = simulate_sum_measurements(
            ssum, patterns["pattern_sum"], args.accuracy, rng, sum_weight
        )
        post = posteriors_from_hard(meas, coding_single, prior_single, args.accuracy)
        post_sum = posteriors_from_hard(meas_sum, coding_sum, prior_sum, args.accuracy)
        s_distr = [post[j * BLOCK_LEN:(j + 1) * BLOCK_LEN] for j in range(NUM_BLOCKS)]
        channel, channel_sum = get_channel_probabilities(
            s_distr, post_sum, sum_weight, args.check_blocks
        )

        t0 = time.time()
        ours = np.asarray(decoder.min_sum(channel, channel_sum))[:n_b]
        t_ours = time.time() - t0
        t0 = time.time()
        enum = enum_dec.min_sum(channel, channel_sum, clip=minplus.BIG)[:n_b]
        t_enum = time.time() - t0

        row = {
            "run": run,
            "correct_ours": int((ours == s_flat).sum()),
            "correct_enum": int((enum == s_flat).sum()),
            "recovered_ours": bool((ours == s_flat).all()),
            "recovered_enum": bool((enum == s_flat).all()),
            "agreement": int((ours == enum).sum()),
            "n": n_b,
            "t_ours_s": round(t_ours, 2),
            "t_enum_s": round(t_enum, 2),
        }
        rows.append(row)
        logger.info(
            f"run {run}: ours {row['correct_ours']}/{n_b} "
            f"(rec={row['recovered_ours']}), enum {row['correct_enum']}/{n_b} "
            f"(rec={row['recovered_enum']}), agree {row['agreement']}/{n_b}"
        )

    summary = {
        "operating_point": {
            "accuracy": args.accuracy,
            "num_patterns": args.num_patterns,
            "num_patterns_sum": args.num_patterns_sum,
            "check_blocks": args.check_blocks,
            "iterations": args.iterations,
        },
        "runs": rows,
        "recovered_ours": sum(r["recovered_ours"] for r in rows),
        "recovered_enum": sum(r["recovered_enum"] for r in rows),
        "mean_correct_ours": float(np.mean([r["correct_ours"] for r in rows])),
        "mean_correct_enum": float(np.mean([r["correct_enum"] for r in rows])),
        "mean_agreement": float(np.mean([r["agreement"] for r in rows])),
    }
    print(json.dumps(summary, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
