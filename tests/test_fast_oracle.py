"""Fast incremental oracle vs native decapsulation — exact equivalence.

The attack's correctness rests on the fast oracle answering identically to
the native decode path for every ciphertext modification it performs."""

import pytest

from sca_ldpc_tpu.models.hqc import Hqc128, toggle_bits_in_v, toggle_outer_block
from sca_ldpc_tpu.models.hqc.oracle_fast import FastCiphertextState
from sca_ldpc_tpu.models.hqc.tracking import HqcSimulationParams
from sca_ldpc_tpu.utils import make_random_state


@pytest.fixture(scope="module")
def setup():
    pub, priv = Hqc128.keypair()
    pt = bytes(range(16))
    ct, _ = Hqc128.encaps_with_plaintext_and_r1(pub, pt, [0, 500, 9000])
    params = HqcSimulationParams(Hqc128, 15, (1.0, 1.0), 100, 3)
    return params, pub, priv, pt, ct


def native_success(params, ct, priv, pt):
    pt2, *_ = params.HQC.decode_intermediates(ct, priv)
    return bytes(pt2) == pt


def test_base_state_matches_native(setup):
    params, pub, priv, pt, ct = setup
    st = FastCiphertextState.from_ciphertext(params, ct, priv, pt)
    assert st.decode_success() == native_success(params, ct, priv, pt)
    assert st.decode_success()  # unmodified ct decodes


def test_block_flips_match_native(setup):
    params, pub, priv, pt, ct = setup
    N, N2 = params.N, params.N2
    st = FastCiphertextState.from_ciphertext(params, ct, priv, pt)
    ct_mod = bytearray(ct)
    rng = make_random_state(0)
    for i, block in enumerate(rng.choice(params.N1, 18, replace=False)):
        ct_mod = toggle_outer_block(ct_mod, int(block), N, N2)
        st.toggle_block(int(block))
        assert st.decode_success() == native_success(params, ct_mod, priv, pt), (
            f"mismatch after {i+1} block flips"
        )


def test_bit_flips_match_native(setup):
    params, pub, priv, pt, ct = setup
    N, N1, N2 = params.N, params.N1, params.N2
    rng = make_random_state(1)
    st = FastCiphertextState.from_ciphertext(params, ct, priv, pt)
    ct_mod = bytearray(ct)
    # push to the failure edge with delta+1 block flips, then walk single bits
    for block in range(params.OUTER_DECODING_LIMIT + 1):
        ct_mod = toggle_outer_block(ct_mod, block, N, N2)
        st.toggle_block(block)
    assert st.decode_success() == native_success(params, ct_mod, priv, pt)

    for trial in range(40):
        bit = int(rng.randint(0, N1 * N2))
        ct_mod = toggle_bits_in_v(ct_mod, [bit], N)
        st.toggle_bits([bit])
        assert st.decode_success() == native_success(params, ct_mod, priv, pt), (
            f"mismatch at trial {trial}, bit {bit}"
        )


def test_probe_does_not_mutate_and_matches(setup):
    params, pub, priv, pt, ct = setup
    N, N1, N2 = params.N, params.N1, params.N2
    rng = make_random_state(2)
    st = FastCiphertextState.from_ciphertext(params, ct, priv, pt)
    for block in range(params.OUTER_DECODING_LIMIT + 1):
        st.toggle_block(block)
    ct_mod = bytearray(ct)
    for block in range(params.OUTER_DECODING_LIMIT + 1):
        ct_mod = toggle_outer_block(ct_mod, block, N, N2)

    bits = [int(b) for b in rng.choice(N1 * N2, 64, replace=False)]
    got = st.probe_bits(bits)
    before = st.wrong_count
    for b, g in zip(bits, got):
        ct_probe = toggle_bits_in_v(ct_mod, [b], N)
        assert bool(g) == native_success(params, ct_probe, priv, pt), f"bit {b}"
    assert st.wrong_count == before  # probes are pure
