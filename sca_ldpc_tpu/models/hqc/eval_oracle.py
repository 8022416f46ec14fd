"""Real timing-oracle evaluation against the native HQC implementation.

Reference: simulate/hqc_eval_oracle.py.  Measures the rejection-sampling
timing side channel of decapsulation (the native decaps re-encrypts with the
decoded plaintext's randomness, csrc/hqc_core.cpp hqc_decaps): profiles
modified vs unmodified ciphertexts, derives a threshold, then sweeps oracle
accuracy against the number of measurements.
"""

import json
import logging
import os

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


def _load_state(state_file):
    if state_file and os.path.exists(state_file):
        with open(state_file) as f:
            return json.load(f)
    return {}


def _save_state(state_file, state):
    if not state_file:
        return
    tmp = state_file + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, state_file)


def hqc_eval_oracle(
    rng,
    keyfile=None,
    num_trials=1000,
    max_log2_measurements=18,
    profile_measurements=2**16,
    reduced_trials=None,
    reduced_from_log2=13,
    state_file=None,
    checkpoint_every=50,
):
    """Full oracle-accuracy evaluation; returns {measurements: accuracy}.

    Long runs (the reference sweeps to 2^17 measurements x 1000 trials,
    hqc_eval_oracle.py:94-112) are made practical by:

    - ``reduced_trials``/``reduced_from_log2``: measurement counts at or
      above 2**reduced_from_log2 use the (smaller) reduced trial count —
      accuracy there saturates near 1, so fewer trials lose little precision.
    - ``state_file``: JSON checkpoint holding the profiling threshold and
      per-level partial tallies; a restarted run resumes mid-level.  The
      threshold is only reusable with the same ``keyfile`` keypair.
    """
    HQC = Hqc128()
    measurements_list = [2**x for x in range(max_log2_measurements)]

    pub, priv = read_or_generate_keypair(HQC, keyfile)

    state = _load_state(state_file)
    if "threshold" in state:
        threshold = state["threshold"]
        logger.info(f"Resuming with checkpointed threshold: {threshold}")
    else:
        profiling_oracle(HQC, rng, pub, priv, "warmup", False, num_profiles=1,
                         measurements=profile_measurements)

        profiling_diff = 0
        while profiling_diff <= 0:
            t_nmod = profiling_oracle(HQC, rng, pub, priv, "profile phase 1",
                                      False, measurements=profile_measurements)
            logger.info(f"Profiling result (nmod): {t_nmod}")
            t_ymod = profiling_oracle(HQC, rng, pub, priv, "profile phase 2",
                                      True, measurements=profile_measurements)
            logger.info(f"Profiling result (ymod): {t_ymod}")
            profiling_diff = t_nmod - t_ymod
            logger.info(f"Profiling diff nmod - ymod: {profiling_diff}")

        threshold = t_nmod - profiling_diff / 2
        logger.info(f"Profiling threshold: {threshold}")
        state = {"threshold": threshold, "t_nmod": t_nmod, "t_ymod": t_ymod,
                 "profile_measurements": profile_measurements, "levels": {}}
        _save_state(state_file, state)

    levels = state.setdefault("levels", {})

    pt = search_distinguishable_plaintext(HQC, rng)
    ctnmod, _ = HQC.encaps_with_plaintext_and_r1(pub, pt, [])

    results = {}
    for log2m, measure in enumerate(measurements_list):
        target = num_trials
        if reduced_trials is not None and log2m >= reduced_from_log2:
            target = reduced_trials
        lev = levels.setdefault(str(measure), {"done": 0, "correct": 0.0,
                                               "counted": 0})
        # Checkpoint roughly every ~2^17 decapsulations, at least every
        # `checkpoint_every` trials.
        ckpt = max(1, min(checkpoint_every, 2**17 // measure))
        while lev["done"] < target:
            ctymod = modify_beyond_correction_limit(HQC, rng, ctnmod)
            t = oracle(HQC, ctymod, priv, measure)
            lev["done"] += 1
            if t is not None:
                decision = t >= threshold
                lev["correct"] += float(decision == False)  # noqa: E712
                lev["counted"] += 1
            if lev["done"] % ckpt == 0:
                _save_state(state_file, state)
        acc = lev["correct"] / lev["counted"] if lev["counted"] else 0.0
        results[measure] = acc
        _save_state(state_file, state)
        logger.info(f"Oracle with {measure} measurements: accuracy {acc} "
                    f"({lev['counted']} trials)")
    return results
