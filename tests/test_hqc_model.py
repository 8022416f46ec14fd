"""Native HQC model conformance (reference: hqc.rs tests + hqc.py doctests).

Uses a session-scoped cached keypair since keygen + repeated decaps are the
expensive parts.
"""

import numpy as np
import pytest

from sca_ldpc_tpu.models.hqc import (
    Hqc128,
    search_distinguishable_plaintext,
    shift_and_add_mod_2_sparse,
    sparse_times_sparse,
    toggle_bits_in_v,
    toggle_outer_block,
)
from sca_ldpc_tpu.utils import make_random_state


@pytest.fixture(scope="module")
def keypair():
    return Hqc128.keypair()


def test_params():
    assert Hqc128.params("N") == 17669
    assert Hqc128.params("N1") == 46
    assert Hqc128.params("N2") == 384
    assert Hqc128.params("N1N2") == 17664
    assert Hqc128.params("DELTA") == 15
    assert Hqc128.params("OMEGA") == 66
    with pytest.raises(ValueError):
        Hqc128.params("BOGUS")


def test_secrets_weight(keypair):
    """hqc.rs:216-226: x has OMEGA set bits; y has OMEGA positions."""
    _pub, sec = keypair
    x, y = Hqc128.secrets_from_key(sec)
    assert sum(bin(w).count("1") for w in x) == 66
    assert len(y) == 66
    assert len(set(y)) == 66


def test_sparse_helpers():
    assert sparse_times_sparse([3, 5, 9], [0, 2], N=10, mod=None) == [1, 3, 5, 5, 7, 9]
    assert sparse_times_sparse([3, 5, 9], [0, 2], N=10, mod=2) == [1, 3, 7, 9]
    assert shift_and_add_mod_2_sparse([1, 5, 8, 12], 3, 15) == [0, 1, 4, 5, 11, 12]


def test_toggle_bits():
    assert toggle_bits_in_v(bytearray((0xFF, 0xFF, 0xFF)), [0, 6], 9).hex() == "ffffbe"
    assert (
        toggle_outer_block(bytearray((0xFF, 0xFF, 0xFE, 0xFE)), 0, 9, 10).hex()
        == "ffff01fd"
    )


def test_distinguishable_plaintext():
    """hqc.py:96-107: found plaintext needs 6 seed expansions (3 + 3 extra)."""
    pt = search_distinguishable_plaintext(Hqc128, make_random_state(0))
    assert Hqc128.num_rejections(pt) // 1000 >= 6


def test_encaps_with_plaintext_and_r1_identity(keypair):
    """hqc.py:1201-1226: eprime == y * r1 for random shifts."""
    pub, sec = keypair
    N = Hqc128.params("N")
    _x, y = Hqc128.secrets_from_key(sec)
    y = sorted(y)
    pt = bytes(Hqc128.new_plaintext())
    rng = make_random_state(0)
    for j in rng.choice(N, 10, replace=False):
        yyj = shift_and_add_mod_2_sparse(y, int(j), N)
        ct, _ = Hqc128.encaps_with_plaintext_and_r1(pub, pt, [0, int(j)])
        ep = Hqc128.eprime(ct, sec, pt)
        bits = np.unpackbits(np.frombuffer(bytes(ep), np.uint8), bitorder="little")
        assert list(np.flatnonzero(bits[:N])) == yyj


def test_block_flip_delta_limit(keypair):
    """Flipping <= DELTA whole RM blocks decodes; DELTA+1 fails."""
    pub, sec = keypair
    pt = bytes(range(16))
    ct, _ = Hqc128.encaps_with_plaintext_and_r1(pub, pt, [0, 500])
    N, N2 = Hqc128.params("N"), Hqc128.params("N2")
    delta = Hqc128.params("DELTA")

    def flip_blocks(ct, nblocks):
        for b in range(nblocks):
            ct = toggle_outer_block(ct, b, N, N2)
        return ct

    pt_ok, *_ = Hqc128.decode_intermediates(flip_blocks(ct, delta), sec)
    assert bytes(pt_ok) == pt
    pt_bad, *_ = Hqc128.decode_intermediates(flip_blocks(ct, delta + 1), sec)
    assert bytes(pt_bad) != pt


def test_decaps_roundtrip(keypair):
    pub, sec = keypair
    ct, ss = Hqc128.encaps(pub)
    ss2, ok = Hqc128.decaps(ct, sec)
    assert ok
    assert bytes(ss2) == bytes(ss)
