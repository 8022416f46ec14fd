"""Constant-work RS decoder contract (csrc/hqc_core.cpp rs_decode).

The decoder must stay a bounded-distance decoder behaviorally — correct
every pattern of <= delta symbol errors exactly, fail beyond — while doing
the SAME work for every input (that property is what keeps the decaps
timing channel equal to the re-encryption rejection sampling; see
BASELINE.md).  Failure must leave the word pristine: decrypt_core's
deterministic miscorrection fold depends on reading the unmodified
syndromes.
"""

import ctypes

import numpy as np
import pytest

from sca_ldpc_tpu.models.hqc.model import Hqc128, Hqc192, Hqc256, _lib


def _rs_roundtrip(HQC, n_err, rng):
    lib = _lib()
    k = int(HQC.params("K"))
    n1 = int(HQC.params("N1"))
    msg = rng.randint(0, 256, size=k, dtype=np.uint8)
    cw = np.zeros(128, np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.hqc_rs_encode(HQC.VER, msg.ctypes.data_as(u8p), cw.ctypes.data_as(u8p))
    clean = cw.copy()
    pos = rng.choice(n1, size=n_err, replace=False)
    for p in pos:
        e = 0
        while e == 0:
            e = int(rng.randint(0, 256))
        cw[p] ^= e
    corrupted = cw.copy()
    ok = lib.hqc_rs_decode(HQC.VER, cw.ctypes.data_as(u8p))
    return ok, clean, corrupted, cw


@pytest.mark.parametrize("HQC", [Hqc128, Hqc192, Hqc256])
def test_rs_corrects_up_to_delta(HQC):
    rng = np.random.RandomState(HQC.VER + 1)
    delta = int(HQC.params("DELTA"))
    n1 = int(HQC.params("N1"))
    for n_err in [0, 1, delta // 2, delta]:
        for _ in range(8):
            ok, clean, _corrupted, out = _rs_roundtrip(HQC, n_err, rng)
            assert ok == 0, f"{n_err} errors must be corrected (n1={n1})"
            assert (out[:n1] == clean[:n1]).all()


@pytest.mark.parametrize("HQC", [Hqc128, Hqc192, Hqc256])
def test_rs_fails_pristine_beyond_delta(HQC):
    rng = np.random.RandomState(HQC.VER + 10)
    delta = int(HQC.params("DELTA"))
    n1 = int(HQC.params("N1"))
    for n_err in [delta + 1, delta + 3, min(2 * delta, n1)]:
        fails = 0
        for _ in range(8):
            ok, _clean, corrupted, out = _rs_roundtrip(HQC, n_err, rng)
            if ok != 0:
                fails += 1
                # failure leaves the word untouched (the miscorrection fold
                # in decrypt_core relies on this)
                assert (out[:n1] == corrupted[:n1]).all()
        # a bounded-distance decoder can occasionally miscorrect a
        # beyond-delta pattern into another codeword, but only by moving
        # <= delta symbols — at delta+1..2delta errors that requires a
        # near-codeword hit, so nearly all trials must fail
        assert fails >= 7
