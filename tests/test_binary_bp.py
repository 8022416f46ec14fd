"""Binary BP decoder correctness.

The reference's binary path is the ldpc PyPI bp_decoder (decode.py:155-175);
conformance here is functional: known-correctable error patterns must be
recovered exactly, FER on the reference's doctest configuration must match
(decode.py:139-149 expects 100/100 at rate 0.05 on the length-13 repetition
code), and received-vector mode must reproduce codewords.
"""

from pathlib import Path

import numpy as np
import pytest

FIXTURES = Path(__file__).resolve().parent.parent / "fixtures"

from sca_ldpc_tpu.channels import ErrorsProvider
from sca_ldpc_tpu.codes import CirculantLayout, make_regular_ldpc_parity_check_matrix
from sca_ldpc_tpu.codes.make_code import random_circulant_first_row
from sca_ldpc_tpu.ops import BinaryBPDecoder, CirculantBPDecoder
from sca_ldpc_tpu.codes.util import rep_code
from sca_ldpc_tpu.sim import simulate_frame_error_rate
from sca_ldpc_tpu.utils import make_random_state


@pytest.mark.parametrize("method", ["product_sum", "min_sum"])
def test_rep_code_single_error(method):
    n = 13
    H = rep_code(n)
    dec = BinaryBPDecoder(H, max_iter=n, method=method, error_rate=0.05)
    e = np.zeros(n, dtype=int)
    e[4] = 1
    syn = H @ e % 2
    out = np.asarray(dec.decode_syndrome(syn))
    assert (out == e).all()


@pytest.mark.parametrize("method", ["product_sum", "min_sum"])
def test_regular_code_batch_decoding(method):
    rng = make_random_state(0)
    H = make_regular_ldpc_parity_check_matrix(300, 150, 3, 6, rng)
    n = H.shape[1]
    dec = BinaryBPDecoder(H, max_iter=60, method=method, error_rate=0.01)
    # batch of frames with small random error patterns (weight 1..3)
    B = 16
    errors = np.zeros((B, n), dtype=int)
    for b in range(B):
        w = 1 + b % 3
        errors[b, rng.choice(n, w, replace=False)] = 1
    syn = (errors @ H.T) % 2
    out, conv, _ = dec.decode_syndrome(syn, return_aux=True)
    out = np.asarray(out)
    assert np.asarray(conv).all()
    assert (out == errors).all()


def test_fer_simulation_rep_code():
    """Reference doctest: 100/100 successes (decode.py:139-149)."""
    rng = make_random_state(0)
    ep = ErrorsProvider(0.05, None, rng)
    H = rep_code(13)
    successes = simulate_frame_error_rate(H, ep, 100, rng)
    assert successes == 100


def test_fer_simulation_with_binary_file():
    rng = make_random_state(0)
    ep = ErrorsProvider(None, str(FIXTURES / "binary_distr.txt"), rng)
    H = rep_code(13)
    successes = simulate_frame_error_rate(H, ep, 50, rng)
    # high per-position error rates (up to 0.3) on a rep code: most frames
    # should still decode (repetition code corrects up to 6 errors)
    assert successes >= 40


def test_received_vector_mode():
    n = 13
    H = rep_code(n)
    dec = BinaryBPDecoder(H, max_iter=n, error_rate=0.05)
    z = np.ones(n, dtype=int)
    z[7] = 0  # one flip from the all-ones codeword
    out = np.asarray(dec.decode_received(z))
    assert (out == 1).all()


@pytest.mark.parametrize("method", ["product_sum", "min_sum"])
def test_circulant_decoder_matches_general(method):
    """The rolled-plane fast path must agree with the general layout decoder
    on the same [circulant | I] code and identical inputs."""
    rng = make_random_state(7)
    n, w = 64, 5
    row = random_circulant_first_row(n, w, rng)
    lay = CirculantLayout.from_first_row(row, with_identity=True)
    H = lay.to_dense()

    B = 8
    errors = np.zeros((B, 2 * n), dtype=int)
    for b in range(B):
        errors[b, rng.choice(2 * n, 2, replace=False)] = 1
    syn = (errors @ H.T) % 2

    probs = np.full(2 * n, 0.02, np.float32)
    general = BinaryBPDecoder(H, max_iter=40, method=method, channel_probs=probs)
    fast = CirculantBPDecoder(lay, max_iter=40, method=method)

    out_g = np.asarray(general.decode_syndrome(syn))
    out_f = np.asarray(fast.decode_syndrome(syn, probs))
    assert (out_g == errors).all()
    assert (out_f == errors).all()


def test_circulant_received_vector():
    rng = make_random_state(9)
    n, w = 32, 3
    row = random_circulant_first_row(n, w, rng)
    lay = CirculantLayout.from_first_row(row, with_identity=True)
    dec = CirculantBPDecoder(lay, max_iter=30)
    z = np.zeros(2 * n, dtype=int)
    z[5] = 1
    probs = np.full(2 * n, 0.02, np.float32)
    out = np.asarray(dec.decode_received(z, probs))
    assert (out == 0).all()
