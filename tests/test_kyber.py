"""Kyber pipeline conformance (reference: simulate/kyber.py, max_likelihood.py)
plus the end-to-end attack integration the reference leaves stubbed."""

import numpy as np
import pytest

from sca_ldpc_tpu.models import kyber
from sca_ldpc_tpu.models.kyber.posterior import (
    SimpleOracle,
    posteriors_from_hard,
    s_distribution_from_hard_y,
)
from sca_ldpc_tpu.utils import make_random_state


def test_secret_distribution():
    """Centered binomial priors (kyber.py:60-64)."""
    d = kyber.secret_distribution(1)
    assert set(d.keys()) == {-2, -1, 0, 1, 2}
    assert abs(d[0] - 6 / 16) < 1e-12
    assert abs(d[1] - 4 / 16) < 1e-12
    assert abs(d[2] - 1 / 16) < 1e-12
    assert abs(sum(d.values()) - 1.0) < 1e-12


def test_sample_secret_coefs_range_and_stats():
    rng = make_random_state(0)
    s = kyber.sample_secret_coefs(20000, rng=rng)
    s = np.asarray(s)
    assert s.min() >= -2 and s.max() <= 2
    # mean ~0, var = eta/2 = 1
    assert abs(s.mean()) < 0.05
    assert abs(s.var() - 1.0) < 0.05


def test_to_zq_range():
    assert kyber.to_zq_range(0) == 0
    assert kyber.to_zq_range(3328) == -1
    assert kyber.to_zq_range(1664) == 1664
    assert kyber.to_zq_range(1665) == -1664


def test_gen_ldpc_matrix_shape_and_balance():
    H = kyber.gen_ldpc_matrix(6, 0, check_blocks=2)
    r = 256 * 2
    n = 256 * 3 + r
    assert H.shape == (r, n)
    # each row: sum_weight entries of +-1 in the secret part, one identity
    secret_part = H[:, : 256 * 3]
    assert (np.abs(secret_part).sum(axis=1) == 6).all()
    assert (H[:, 256 * 3 :] == np.identity(r)).all()
    # signed circulant wraparound: every row of a block sums over the same
    # coefficient pattern, so |column| weights are balanced per block
    assert set(np.unique(secret_part)) <= {-1, 0, 1}


def test_compute_ssum_bounds():
    rng = make_random_state(2)
    H = kyber.gen_ldpc_matrix(6, rng, check_blocks=1)
    s, ssum = kyber.generate_secret_for_H(True, H, 1, rng=rng)
    assert len(ssum) == 256
    assert max(abs(v) for v in ssum) <= 6 * kyber.ETA


def test_pattern_databases():
    p = kyber.get_single_patterns(2, 0.95, 3)
    assert len(p) == 5  # symbols -2..2
    ps = kyber.get_sum_patterns(2, 3, 6)
    assert len(ps) == 25  # symbols -12..12
    both = kyber.get_patterns(2, 0.95, 3, 3, 6)
    assert both["pattern"] == p and both["pattern_sum"] == ps
    with pytest.raises(ValueError):
        kyber.get_single_patterns(2, 0.42, 3)
    # closest-accuracy fallback
    p2 = kyber.get_single_patterns(2, 0.94, 3, use_closest_accuracy=True)
    assert p2 == p
    # adaptive eta-3 database
    pa = kyber.get_restricted_single_patterns(3, 0.995, 2.5625)
    assert len(pa) == 7


def test_pattern_four_consecutive():
    p = kyber.pattern_four_consecutive(8, 0)
    assert p == (1, 1, 1, 1, 0, 0, 0, 0)


def test_posterior_vectorized_matches_scalar():
    """Vectorized posteriors == max_likelihood.py's scalar computation."""
    pattern = kyber.get_single_patterns(2, 0.95, 3)
    coding = kyber.coding_from_patterns(pattern, 1)
    prior = kyber.secret_distribution(1)
    oracle = SimpleOracle(0.95)
    rng = make_random_state(0)
    Y = rng.randint(0, 2, size=(10, 3))
    post_vec = posteriors_from_hard(Y, coding, prior, 0.95)
    for i in range(10):
        post_scalar = s_distribution_from_hard_y(
            tuple(Y[i]), oracle, kyber.secret_range, coding, prior, 1
        )
        assert np.allclose(post_vec[i], post_scalar, atol=1e-10)


def test_posterior_fpfn_matches_scalar_and_uniform():
    """Vectorized per-position FP/FN posteriors == the scalar
    FalsePositiveNegativePositionalOracle path, and collapse to the
    uniform-accuracy posterior when fp == fn == 1 - accuracy."""
    from sca_ldpc_tpu.models.kyber.posterior import (
        FalsePositiveNegativePositionalOracle,
        normalize_fp_fn,
        posteriors_from_hard_fpfn,
    )

    pattern = kyber.get_single_patterns(2, 0.95, 3)
    coding = kyber.coding_from_patterns(pattern, 1)
    prior = kyber.secret_distribution(1)
    rng = make_random_state(1)
    Y = rng.randint(0, 2, size=(10, 3))

    p_arr = normalize_fp_fn([0.02, 0.1, 0.05], [0.08, 0.01, 0.2], 3)
    oracle = FalsePositiveNegativePositionalOracle(p_arr)
    post_vec = posteriors_from_hard_fpfn(Y, coding, prior, p_arr)
    for i in range(10):
        post_scalar = s_distribution_from_hard_y(
            tuple(Y[i]), oracle, kyber.secret_range, coding, prior, 1
        )
        assert np.allclose(post_vec[i], post_scalar, atol=1e-12)

    uni = normalize_fp_fn(0.05, 0.05, 3)
    post_u = posteriors_from_hard_fpfn(Y, coding, prior, uni)
    assert np.allclose(post_u, posteriors_from_hard(Y, coding, prior, 0.95),
                       atol=1e-12)


def test_kyber_attack_fpfn_noise():
    """End-to-end attack under asymmetric per-position oracle noise: at
    low rates nearly all coefficients recover; matched-model posteriors
    keep the pipeline consistent (VERDICT r3 stretch #8)."""
    rng = make_random_state(9)
    results = kyber.simulate_kyber_attack(
        rng, accuracy=0.995, num_patterns=3, num_patterns_sum=3,
        sum_weight=6, check_blocks=2, iterations=10, runs=1,
        fp=[0.002, 0.01, 0.005], fn=0.008,
    )
    res = results[0]
    frac = res["correct_coefficients"] / res["total_coefficients"]
    assert frac > 0.95


def test_channel_probabilities_assembly():
    """kyber.py:362-376: sum distributions are reversed."""
    sum_weight = 6
    B = sum_weight * kyber.ETA
    s_distr = [np.tile(np.arange(5, dtype=np.float32), (256, 1)) for _ in range(3)]
    ssum_distr = np.tile(np.arange(2 * B + 1, dtype=np.float32), (256, 1))
    ch, ch_sum = kyber.get_channel_probabilities(s_distr, ssum_distr, sum_weight, 1)
    assert ch.shape == (768, 5)
    assert ch_sum.shape == (256, 25)
    assert (ch_sum[0] == np.arange(2 * B + 1)[::-1]).all()


def test_get_decoder_validates_shape():
    H = kyber.gen_ldpc_matrix(6, 0, check_blocks=1)
    dec = kyber.get_decoder(6, H, 1, iterations=3)
    assert dec.sw == 6 and dec.b == 2 and dec.bsum == 12
    with pytest.raises(ValueError):
        kyber.get_decoder(6, H[:, :-1], 1, iterations=3)


def test_kyber_attack_high_accuracy_recovers():
    """End-to-end: at very high oracle accuracy the attack recovers nearly
    all coefficients (full integration of the stubbed kyber.py:379-435)."""
    rng = make_random_state(7)
    results = kyber.simulate_kyber_attack(
        rng, accuracy=0.995, num_patterns=3, num_patterns_sum=3,
        sum_weight=6, check_blocks=2, iterations=10, runs=1,
    )
    res = results[0]
    frac = res["correct_coefficients"] / res["total_coefficients"]
    assert frac > 0.95
