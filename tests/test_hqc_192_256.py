"""HQC-192/256 parameter-set coverage of the native model and fast oracle."""

import pytest

from sca_ldpc_tpu.models.hqc import Hqc192, Hqc256, toggle_outer_block
from sca_ldpc_tpu.models.hqc.oracle_fast import FastCiphertextState
from sca_ldpc_tpu.models.hqc.tracking import HqcSimulationParams


@pytest.mark.parametrize(
    "HQC,n,n1,n2,delta,omega,limit",
    [
        (Hqc192, 35851, 56, 640, 16, 100, 16),
        (Hqc256, 57637, 90, 640, 29, 131, 29),
    ],
)
def test_params_and_roundtrip(HQC, n, n1, n2, delta, omega, limit):
    assert HQC.params("N") == n
    assert HQC.params("N1") == n1
    assert HQC.params("N2") == n2
    assert HQC.params("DELTA") == delta
    assert HQC.params("OMEGA") == omega

    pub, sec = HQC.keypair()
    _x, y = HQC.secrets_from_key(sec)
    assert len(set(y)) == omega

    pt = bytes(range(len(HQC.new_plaintext())))
    ct, _ = HQC.encaps_with_plaintext_and_r1(pub, pt, [0, 1000])
    pt2, *_ = HQC.decode_intermediates(ct, sec)
    assert bytes(pt2) == pt

    # delta-edge behavior + fast-oracle equivalence
    params = HqcSimulationParams(HQC, limit, (1.0, 1.0), 100, 3)
    st = FastCiphertextState.from_ciphertext(params, ct, sec, pt)
    assert st.decode_success()
    ct_mod = bytearray(ct)
    for b in range(delta + 1):
        ct_mod = toggle_outer_block(ct_mod, b, n, n2)
        st.toggle_block(b)
        pt3, *_ = HQC.decode_intermediates(ct_mod, sec)
        assert st.decode_success() == (bytes(pt3) == pt), f"block {b}"
    assert not st.decode_success()
