"""Real timing-channel oracle backend for the HQC key-recovery attack.

The reference stops at *evaluating* its rejection-sampling timing oracle
(simulate/hqc_eval_oracle.py measures an accuracy-vs-measurements curve) and
runs the actual attack only against the idealized oracle with simulated
epsilon noise (simulate/hqc.py:809-871).  This module closes the loop the
reference leaves open: it drives the full chosen-ciphertext attack with
decisions coming from **measured decapsulation timing** of the native HQC
implementation (csrc/hqc_core.cpp), so key recovery happens end-to-end from
the physical side channel.

The channel is the one the reference characterizes (hqc.rs:175-200): decaps
re-encrypts with the decoded plaintext's randomness, and the attack plaintext
is chosen to need >=3 extra seed-expander expansions
(search_distinguishable_plaintext, hqc.py:96-124).  A decoding failure
re-encrypts a *different* plaintext with (almost surely) no extra expansions,
so failing decapsulations are measurably faster.

Each oracle decision is a **drift-robust differential measurement** (see
eval_oracle.py): the probe ciphertext and the attack's known-good base
ciphertext are cycle-timed in interleaved chunks and classified by the
difference of their first-percentile estimates against the profiled gap.
Per-decision accuracy is limited (~0.93 at 64 measurements on a noisy shared
host, artifacts/hqc128_oracle_accuracy.csv); the attack absorbs that exactly
like idealized epsilon noise — certainty amplification repeats measurements
until the required confidence, and the LDPC decode weighs each check by its
accumulated certainty.  That is the paper's central claim, demonstrated here
against a real channel rather than a simulated one.
"""

import logging

from .eval_oracle import (
    _measure_interleaved,
    modify_beyond_correction_limit,
    profiling_oracle,
    profiling_oracle_interleaved,
)

logger = logging.getLogger(__name__)


class TimingChannel:
    """Measured decryption-failure oracle.

    ``measure_success(ct)`` classifies one ciphertext by differential
    interleaved cycle timing against the known-success base ciphertext:
    True = "decapsulation re-encrypted the distinguishable plaintext"
    (decode success), False = decode failure.

    ``gap`` is the profiled first-percentile cycle difference between the
    unmodified and modified classes (positive: failures are faster).
    """

    def __init__(self, HQC, priv, base_ct, gap, measure=64, chunk_cap=None,
                 max_retries=8):
        self.HQC = HQC
        self.priv = priv
        self.base_ct = bytes(base_ct)
        self.gap = gap
        self.measure = int(measure)
        self.chunk_cap = chunk_cap
        self.max_retries = max_retries
        # accounting / live ground-truth agreement stats
        self.num_measurements = 0
        self.num_decaps = 0
        self.truth_agree = [0, 0]  # indexed by true answer
        self.truth_total = [0, 0]

    def rebase(self, base_ct):
        """Point the differential reference at a new attack ciphertext
        (called when the attack restarts with a fresh plaintext)."""
        self.base_ct = bytes(base_ct)

    def _chunk(self):
        chunk = max(16, self.measure // 8)
        if self.chunk_cap is not None:
            chunk = min(chunk, int(self.chunk_cap))
        return chunk

    def measure_success(self, ct):
        for _ in range(self.max_retries):
            t_probe, t_ref = _measure_interleaved(
                self.HQC, self.priv, [bytes(ct), self.base_ct],
                self.measure, self._chunk(),
            )
            self.num_measurements += 1
            self.num_decaps += 2 * self.measure
            if t_probe is not None and t_ref is not None:
                return (t_probe - t_ref) > -self.gap / 2
        raise RuntimeError(
            "timing channel: no usable samples after "
            f"{self.max_retries} measurement attempts (all discarded?)"
        )

    def record_truth(self, reported, true_answer):
        """Track live agreement with the (cheating) ground-truth oracle —
        the attack's empirical per-class accuracy measurement."""
        t = int(bool(true_answer))
        self.truth_total[t] += 1
        if bool(reported) == bool(true_answer):
            self.truth_agree[t] += 1

    def empirical_accuracy(self):
        """(acc_when_true_is_failure, acc_when_true_is_success), None where
        unobserved."""
        return tuple(
            (self.truth_agree[i] / self.truth_total[i])
            if self.truth_total[i] else None
            for i in (0, 1)
        )


def calibrate_timing_channel(
    HQC,
    rng,
    pub,
    priv,
    measure=64,
    profile_measurements=2**14,
    calibration_trials=100,
    chunk_cap=None,
    max_profile_attempts=10,
):
    """Profile the timing channel and measure its per-class accuracy.

    Returns ``(gap, acc_fail, acc_success, calib_ct)`` where ``gap`` is the
    profiled class separation, ``acc_fail``/``acc_success`` are the empirical
    probabilities of correctly classifying a failing / succeeding ciphertext
    at ``measure`` measurements per decision (the attack's per-measurement
    EPSILON), and ``calib_ct`` is the unmodified ciphertext used.

    Profiling uses the interleaved drift-robust methodology
    (eval_oracle.profiling_oracle_interleaved); a non-positive gap (profile
    corrupted by ambient load) is retried.
    """
    from .attack import search_distinguishable_plaintext

    # Warm the caches / branch predictors like the reference's warmup phase.
    profiling_oracle(HQC, rng, pub, priv, "warmup", False, num_profiles=1,
                     measurements=min(profile_measurements, 2**13))

    gap = None
    for attempt in range(max_profile_attempts):
        t_nmod, t_ymod, gap = profiling_oracle_interleaved(
            HQC, rng, pub, priv, measurements=profile_measurements
        )
        logger.info(
            f"Timing profile attempt {attempt}: nmod={t_nmod} ymod={t_ymod} "
            f"gap={gap}"
        )
        if gap is not None and gap > 0:
            break
    else:
        raise RuntimeError(
            f"timing channel profiling failed: no positive gap in "
            f"{max_profile_attempts} attempts (host too noisy?)"
        )

    pt = search_distinguishable_plaintext(HQC, rng)
    ctnmod, _ = HQC.encaps_with_plaintext_and_r1(pub, pt, [])
    channel = TimingChannel(HQC, priv, ctnmod, gap, measure=measure,
                            chunk_cap=chunk_cap)

    correct_fail = 0
    for _ in range(calibration_trials):
        ctymod = modify_beyond_correction_limit(HQC, rng, ctnmod)
        if not channel.measure_success(ctymod):
            correct_fail += 1
    correct_succ = 0
    for _ in range(calibration_trials):
        if channel.measure_success(ctnmod):
            correct_succ += 1

    acc_fail = correct_fail / calibration_trials
    acc_success = correct_succ / calibration_trials
    logger.info(
        f"Timing channel calibration at {measure} measurements/decision: "
        f"acc_fail={acc_fail:.3f} acc_success={acc_success:.3f} (gap {gap})"
    )
    return gap, acc_fail, acc_success, ctnmod
