"""Q-ary decoder conformance.

Ports the reference's Rust unit-test contracts:
- into_llr exact values (decoder.rs:744-768)
- toy 6x3 B=7 decode (decoder.rs:771-799)
- medium 450x150 regular code decode (decoder.rs:818-854; we generate an
  equivalent (3,6)+identity regular code rather than shipping the fixture)
- q-ary FER doctest configuration (decode.py:192-209, expects success)
"""

import numpy as np
import pytest

from sca_ldpc_tpu.channels.llr import probs_to_llr
from sca_ldpc_tpu.codes import make_regular_ldpc_parity_check_matrix_identity
from sca_ldpc_tpu.ops import QaryDecoder, QarySpecialDecoder
from sca_ldpc_tpu.sim import simulate_frame_error_rate_qary
from sca_ldpc_tpu.utils import make_random_state


def test_into_llr_exact():
    """decoder.rs:744-768: llr = ln(max/p), inf where p == 0."""
    row = [0.0, 0.0, 0.0, 0.0, 0.14, 0.14, 0.14, 0.14, 0.14, 0.14, 0.14, 0.02, 0.0, 0.0, 0.0]
    llr = np.asarray(probs_to_llr(np.array([row], np.float32)))
    expected = np.array(
        [np.inf] * 4 + [0.0] * 7 + [1.9459101] + [np.inf] * 3, dtype=np.float32
    )
    assert np.allclose(llr[0], expected, rtol=1e-5)


def _toy_decoder(max_iter=10):
    H = np.array(
        [
            [1, 1, 1, 1, 0, 0],
            [0, 0, 1, 1, 0, 1],
            [1, 0, 0, 1, 1, 0],
        ],
        dtype=np.int8,
    )
    return QaryDecoder(H, b_range=7, max_iter=max_iter)


def test_toy_decoder_corrects_single_symbol():
    """decoder.rs:771-799: zero codeword, one noisy symbol -> all-zero out."""
    dec = _toy_decoder()
    q = 15
    channel = np.zeros((6, q), np.float32)
    channel[:, 7] = 1.0  # certain zero
    channel[1, 7] = 0.1
    channel[1, 14] = 0.9  # symbol +7 likely
    out = np.asarray(dec.min_sum(channel))
    assert out.tolist() == [0] * 6


def test_toy_decoder_batch():
    dec = _toy_decoder()
    q = 15
    base = np.zeros((6, q), np.float32)
    base[:, 7] = 1.0
    batch = np.stack([base] * 4)
    batch[2, 3, 7] = 0.2
    batch[2, 3, 8] = 0.8
    out = np.asarray(dec.min_sum(batch))
    assert out.shape == (4, 6)
    assert (out == 0).all()


def test_medium_decoder_450():
    """decoder.rs:818-854 equivalent: (3,6)+I regular code, B=7, 10 iters."""
    rng = make_random_state(1)
    H = make_regular_ldpc_parity_check_matrix_identity(300, 150, 3, 6, rng).astype(np.int8)
    dec = QaryDecoder(H, b_range=7, max_iter=10)
    q = 15
    channel = np.zeros((450, q), np.float32)
    channel[:, 7] = 1.0
    channel[1, 7] = 0.1
    channel[1, 14] = 0.9
    out = np.asarray(dec.min_sum(channel))
    assert (out == 0).all()


def test_qary_fer_simulation():
    """decode.py:192-209 doctest: seed 1, one run at rate 0.005 -> 1 success.

    host_sampling replays the reference's exact RNG stream, so this decodes
    the reference's exact frame (errors at positions 343 and 433)."""
    rng = make_random_state(1)
    H = make_regular_ldpc_parity_check_matrix_identity(300, 150, 3, 6, rng)
    successes, max_ok, min_fail = simulate_frame_error_rate_qary(
        H, 1, 0.005, 1, rng, iterations=5, host_sampling=True
    )
    assert successes == 1
    assert max_ok == 2


def test_qary_matches_enumeration_reference():
    """Conformance against a direct Python model of the Rust enumeration
    semantics (decoder.rs:560-666): exact agreement on 1-iteration messages
    and on full decodes of non-marginal (single-error) frames."""
    from qary_reference import ref_min_sum

    rng = make_random_state(3)
    H = make_regular_ldpc_parity_check_matrix_identity(30, 15, 3, 6, rng).astype(np.int8)
    n = H.shape[1]
    b = 1
    q = 3
    p = 1.0 / q
    good = np.full(q, p, np.float32)
    bad = np.full(q, p, np.float32)
    good[[b, -1]] = [1.75 * p, 0.25 * p]
    bad[[-1, b]] = [1.75 * p, 0.25 * p]

    dec1 = QaryDecoder(H, b, 1)
    dec5 = QaryDecoder(H, b, 5)
    for trial in range(5):
        ch = np.tile(good, (n, 1)).astype(np.float32)
        ch[rng.choice(n, 1, replace=False)] = bad
        assert (ref_min_sum(H, b, 1, ch) == np.asarray(dec1.min_sum(ch))).all()
        assert (ref_min_sum(H, b, 5, ch) == np.asarray(dec5.min_sum(ch))).all()


def test_signed_entries_decode():
    """H entries of -1 exercise the GF reversal path (decoder.rs:164-172)."""
    H = np.array(
        [
            [1, -1, 1, 0],
            [0, 1, -1, 1],
        ],
        dtype=np.int8,
    )
    dec = QaryDecoder(H, b_range=2, max_iter=8)
    q = 5
    # true word: x = (1, 1, 0, 1): checks: x0 - x1 + x2 = 0; x1 - x2 + x3 = 2...
    # use a zero word instead but with asymmetric noise on a signed column
    channel = np.zeros((4, q), np.float32)
    channel[:, 2] = 1.0
    channel[1, 2] = 0.15
    channel[1, 0] = 0.85  # pulls toward -2
    out = np.asarray(dec.min_sum(channel))
    assert (out == 0).all()


def test_special_decoder_zero_word():
    """DecoderSpecial semantics: [H'|I] with BSUM = SW*B; zero secrets and
    zero sums decode to zero (decoder_special.rs:294-617)."""
    rng = make_random_state(5)
    from sca_ldpc_tpu.codes import make_qary_qc_parity_check_matrix

    block = 16
    H = make_qary_qc_parity_check_matrix(block, 6, 3, rng, check_blocks=1).astype(np.int8)
    n = H.shape[1]
    r = H.shape[0]
    n_b = n - r
    b, sw = 2, 6
    bsum = b * sw
    dec = QarySpecialDecoder(H, b=b, bsum=bsum, max_iter=5, sw=sw)

    ch_b = np.zeros((n_b, 2 * b + 1), np.float32)
    ch_b[:, b] = 0.9
    ch_b[:, b - 1] = 0.05
    ch_b[:, b + 1] = 0.05
    ch_s = np.zeros((r, 2 * bsum + 1), np.float32)
    ch_s[:, bsum] = 0.9
    ch_s[:, bsum - 1] = 0.05
    ch_s[:, bsum + 1] = 0.05
    out = np.asarray(dec.min_sum(ch_b, ch_s))
    assert out.shape == (n,)
    assert (out == 0).all()


def test_special_decoder_recovers_secret():
    """Nonzero secret: exact sums + mildly noisy secret priors recover s."""
    rng = make_random_state(11)
    from sca_ldpc_tpu.codes import make_qary_qc_parity_check_matrix

    block = 16
    b, sw = 2, 6
    bsum = b * sw
    H = make_qary_qc_parity_check_matrix(block, sw, 3, rng, check_blocks=1).astype(np.int8)
    n = H.shape[1]
    r = H.shape[0]
    n_b = n - r

    s = rng.randint(-b, b + 1, size=n_b)
    # exact check sums: H' s + sum_var = 0  =>  sum_var = -H' s
    sums = -(H[:, :n_b] @ s)
    assert np.abs(sums).max() <= bsum

    ch_b = np.full((n_b, 2 * b + 1), 0.02, np.float32)
    for i, v in enumerate(s):
        ch_b[i, v + b] = 1.0 - 0.02 * (2 * b)
    ch_s = np.zeros((r, 2 * bsum + 1), np.float32)
    for i, v in enumerate(sums):
        ch_s[i, v + bsum] = 1.0
    dec = QarySpecialDecoder(H, b=b, bsum=bsum, max_iter=10, sw=sw)
    out = np.asarray(dec.min_sum(ch_b, ch_s))
    assert (out[:n_b] == s).all()
    assert (out[n_b:] == sums).all()


def test_decoder_registry():
    """Reference decoder-instance names resolve to working decoders
    (lib.rs:32-75 registration + decode.py:227-229 reflection)."""
    from sca_ldpc_tpu.ops import decoder_name_for, get_decoder_by_name

    rng = make_random_state(1)
    H = make_regular_ldpc_parity_check_matrix_identity(300, 150, 3, 6, rng).astype(np.int8)
    name = decoder_name_for(H, 1)
    assert name == "DecoderN450R150V3C7B1"
    dec = get_decoder_by_name(name, H, iterations=5)
    q = 3
    ch = np.zeros((450, q), np.float32)
    ch[:, 1] = 1.0
    assert (np.asarray(dec.min_sum(ch)) == 0).all()

    from sca_ldpc_tpu.models.kyber import gen_ldpc_matrix

    Hk = gen_ldpc_matrix(6, 0, check_blocks=2)
    deck = get_decoder_by_name("DecoderN1280R512SW6", Hk, iterations=3)
    assert deck.sw == 6 and deck.bsum == 12

    with pytest.raises(ValueError):
        get_decoder_by_name("DecoderBogus", H, 5)
    with pytest.raises(ValueError):
        get_decoder_by_name("DecoderN450R150V3C7B1", H[:, :-1], 5)


def test_qary_early_exit_matches_fixed():
    """early_exit=True returns the same hard decisions as the fixed-iteration
    path on convergent inputs (and satisfies all checks)."""
    from sca_ldpc_tpu.codes import make_regular_ldpc_parity_check_matrix_identity
    from sca_ldpc_tpu.ops import QaryDecoder
    from sca_ldpc_tpu.utils import make_random_state

    rng = make_random_state(1)
    H = make_regular_ldpc_parity_check_matrix_identity(60, 30, 3, 6, rng).astype(np.int8)
    b, q = 2, 5
    dec = QaryDecoder(H, b, max_iter=8)
    dec_ee = QaryDecoder(H, b, max_iter=8, early_exit=True)
    n = H.shape[1]
    probs = np.full((16, n, q), 0.02, np.float32)
    probs[:, :, b] = 0.92
    # a couple of noisy positions per frame
    r2 = np.random.RandomState(0)
    for f in range(16):
        for j in r2.choice(n, 2, replace=False):
            probs[f, j] = 0.1
            probs[f, j, (b + r2.randint(1, q)) % q] = 0.6
    h_fixed = np.asarray(dec.min_sum(probs))
    h_ee = np.asarray(dec_ee.min_sum(probs))
    # all early-exit outputs satisfy every check
    sat = (H.astype(np.int64) @ h_ee.T == 0).all()
    assert sat
    assert (h_fixed == h_ee).all()


def test_qary_special_early_exit_matches_fixed():
    """Nonzero secrets: the early-exit satisfaction rule (counterweight
    signs) must latch the true codeword, not just the all-zero one."""
    from sca_ldpc_tpu.models.kyber import gen_ldpc_matrix
    from sca_ldpc_tpu.ops import QarySpecialDecoder

    H = np.asarray(gen_ldpc_matrix(6, 0, check_blocks=1), np.int64)
    b, bsum = 2, 12
    q, qs = 2 * b + 1, 2 * bsum + 1
    n_b, r = 768, 256
    rng = np.random.RandomState(5)
    frames = 4
    ch_b = np.full((frames, n_b, q), 0.01, np.float32)
    ch_s = np.full((frames, r, qs), 1e-4, np.float32)
    words = np.zeros((frames, n_b + r), np.int64)
    for f in range(frames):
        s = rng.randint(-b, b + 1, size=n_b)
        # the sum variable absorbs the signed B-var sum: H @ [s, x] == 0
        hs = H[:, :n_b] @ s
        x = np.zeros(r, np.int64)
        for row in range(r):
            col = np.nonzero(H[row, n_b:])[0][0]
            x[col] = -hs[row] // H[row, n_b + col]
        assert (H @ np.concatenate([s, x]) == 0).all()
        words[f] = np.concatenate([s, x])
        ch_b[f, np.arange(n_b), s + b] = 0.9
        ch_s[f, np.arange(r), x + bsum] = 0.99
    dx = QarySpecialDecoder(H.astype(np.int8), b, bsum, max_iter=6)
    de = QarySpecialDecoder(H.astype(np.int8), b, bsum, max_iter=6, early_exit=True)
    hx = np.asarray(dx.min_sum(ch_b, ch_s))
    he = np.asarray(de.min_sum(ch_b, ch_s))
    assert (hx == he).all()
    assert (he == words).all()
    assert (np.einsum("rn,fn->fr", H, he) == 0).all()


def test_special_matches_enumeration_reference():
    """Conformance of the two-alphabet decoder against a direct Python model
    of the Rust DecoderSpecial enumeration semantics
    (decoder_special.rs:471-617): exact hard-decision agreement at 1 and at 4
    iterations, including an irregular row (the num_ignore pinned-zero rule,
    :247-263) and -1 entries (the GF-reversal path).

    Messages differ by the known per-check constant: the framework keeps the
    degree-1 sum variables' v2c un-normalized (their extrinsic min shifts
    every configuration sum equally, so all hard decisions are invariant);
    the comparison is therefore on hard decisions of BOTH classes.
    """
    from qary_reference import ref_special_min_sum
    from sca_ldpc_tpu.ops import minplus

    rng = make_random_state(17)
    n_b, r, sw, b = 12, 6, 3, 2
    bsum = sw * b
    H = np.zeros((r, n_b + r), np.int8)
    for i in range(r):
        deg = 2 if i == 0 else sw  # one irregular row
        cols = rng.choice(n_b, deg, replace=False)
        H[i, cols] = rng.choice([-1, 1], deg)
        H[i, n_b + i] = rng.choice([-1, 1])

    # 1 iteration: exact on arbitrary (even inconsistent) posteriors.
    dec1 = QarySpecialDecoder(H, b=b, bsum=bsum, max_iter=1, sw=sw)
    for trial in range(4):
        p_b = rng.dirichlet(np.full(2 * b + 1, 2.0), size=n_b).astype(np.float32)
        p_s = rng.dirichlet(np.full(2 * bsum + 1, 2.0), size=r).astype(np.float32)
        ours = np.asarray(dec1.min_sum(p_b, p_s))
        ref = ref_special_min_sum(H, b, bsum, 1, p_b, p_s, clip=minplus.BIG)
        assert (ours == ref).all(), (trial, ours, ref)

    # Multiple iterations: exact on consistent posteriors (true secret +
    # exact sums + mild noise) and a REGULAR H.  On inconsistent random
    # posteriors BP is chaotic and the two implementations' different float
    # association orders legitimately diverge — the same reason the plain
    # decoder's conformance is message-exact at 1 iteration and statistical
    # beyond.  Irregular rows are excluded here: their unreachable
    # counterweight values keep +inf beta_sum entries, whose inf-inf = NaN
    # then follows Rust's NaN-ignoring f32::min — semantics the Kyber code
    # (regular, deg == SW every row) never reaches and this framework's
    # finite-BIG clipping intentionally does not reproduce.
    H = np.zeros((r, n_b + r), np.int8)
    for i in range(r):
        cols = rng.choice(n_b, sw, replace=False)
        H[i, cols] = rng.choice([-1, 1], sw)
        H[i, n_b + i] = rng.choice([-1, 1])
    dec4 = QarySpecialDecoder(H, b=b, bsum=bsum, max_iter=4, sw=sw)
    for trial in range(4):
        s = rng.randint(-b, b + 1, size=n_b)
        ssum = -(H[:, :n_b] @ s)  # row sums: H's + sum_var = 0
        sum_col = np.array([np.flatnonzero(H[i, n_b:])[0] for i in range(r)])
        p_b = np.full((n_b, 2 * b + 1), 0.04, np.float32)
        p_b[np.arange(n_b), s + b] = 1.0 - 0.04 * (2 * b)
        p_s = np.full((r, 2 * bsum + 1), 0.004, np.float32)
        vals = ssum * H[np.arange(r), n_b + sum_col]
        p_s[sum_col, vals + bsum] = 1.0 - 0.004 * (2 * bsum)
        ours = np.asarray(dec4.min_sum(p_b, p_s))
        ref = ref_special_min_sum(H, b, bsum, 4, p_b, p_s, clip=minplus.BIG)
        assert (ours == ref).all(), (trial, ours, ref)
        assert (ours[:n_b] == s).all()
