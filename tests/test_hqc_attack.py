"""HQC attack decode-path conformance.

Ports the reference's embedded integration tests:
- toy decode (hqc.py:1229-1274, N_OVERRIDE=20): all-position checks with
  certainty 1 recover a small y.
- full decode (hqc.py:1277-1311): perfect value-1 checks on the real
  HQC-128 N recover a random weight-OMEGA y.
"""

import numpy as np

from sca_ldpc_tpu.codes.make_code import (
    make_random_ldpc_parity_check_matrix,
    random_circulant_first_row,
)
from sca_ldpc_tpu.models.hqc import Hqc128, sparse_times_sparse
from sca_ldpc_tpu.models.hqc.attack import CheckDecoder, add_check
from sca_ldpc_tpu.models.hqc.tracking import HqcSimulationParams, HqcSimulationTracking
from sca_ldpc_tpu.utils import make_random_state


def _run_decode(params, first_row, y_sparse, only_ones):
    tracking = HqcSimulationTracking(params)
    shifts = np.flatnonzero(first_row)
    decoder = CheckDecoder(params)
    r1_sparse = [int(i) for i in shifts]
    y_times_r1 = sparse_times_sparse(sorted(y_sparse), r1_sparse, params.N)

    checks = []
    for bit_n in range(params.N):
        value = bit_n in y_times_r1
        if value or not only_ones:
            add_check(decoder, shifts, checks, y_times_r1, bit_n, value, certainty=1.0)
    return decoder.decode(tracking, checks, sorted(y_sparse)), tracking


def test_toy_decode():
    """hqc.py:1229-1274 with N_OVERRIDE=20."""
    params = HqcSimulationParams(Hqc128, None, None, None, WEIGHT=3, N_OVERRIDE=20)
    rng = make_random_state(0)
    y_sparse = [4, 5, 7, 9]
    Hgen = make_random_ldpc_parity_check_matrix(params.N, params.WEIGHT, rng)
    ok, tracking = _run_decode(params, Hgen[0], y_sparse, only_ones=False)
    assert ok
    assert tracking.decoder_stats[-1]["success"]
    assert tracking.decoder_stats[-1]["good_flips"] == len(y_sparse)
    assert tracking.decoder_stats[-1]["bad_flips"] == 0


def test_multi_plaintext_decode():
    """Checks accumulated from two different circulants (the attack draws a
    fresh Hgen per plaintext while the check set persists, hqc.py:1039-1056)
    must keep their own supports and still decode."""
    params = HqcSimulationParams(Hqc128, None, None, None, WEIGHT=3, N_OVERRIDE=40)
    tracking = HqcSimulationTracking(params)
    rng = make_random_state(4)
    y_sparse = [3, 11, 17, 29, 35]

    decoder = CheckDecoder(params)
    checks = []
    for seed in [10, 11]:
        row = random_circulant_first_row(params.N, params.WEIGHT, make_random_state(seed))
        shifts = np.flatnonzero(row)
        y_times_r1 = sparse_times_sparse(
            sorted(y_sparse), [int(i) for i in shifts], params.N
        )
        # the same even row indices from each of two circulants: the rows
        # have distinct supports, so the decoder must keep them apart
        for bit_n in range(0, params.N, 2):
            add_check(
                decoder, shifts, checks, y_times_r1, bit_n,
                bit_n in y_times_r1, certainty=1.0,
            )
    ok = decoder.decode(tracking, checks, sorted(y_sparse))
    assert ok


def test_full_decode():
    """hqc.py:1277-1311: full N=17669, perfect checks for value-1 bits only."""
    params = HqcSimulationParams(Hqc128, None, None, None, WEIGHT=3)
    rng = make_random_state(0)
    OMEGA = Hqc128.params("OMEGA")
    y_sparse = rng.choice(params.N, OMEGA, replace=False)
    first_row = random_circulant_first_row(params.N, params.WEIGHT, rng)
    ok, tracking = _run_decode(params, first_row, list(map(int, y_sparse)), only_ones=True)
    assert ok


def _run_decode_masked(params, first_row, y_sparse, only_ones):
    from sca_ldpc_tpu.models.hqc.attack import MaskedCirculantCheckDecoder

    tracking = HqcSimulationTracking(params)
    shifts = np.flatnonzero(first_row)
    decoder = MaskedCirculantCheckDecoder(params)
    r1_sparse = [int(i) for i in shifts]
    y_times_r1 = sparse_times_sparse(sorted(y_sparse), r1_sparse, params.N)

    checks = []
    for bit_n in range(params.N):
        value = bit_n in y_times_r1
        if value or not only_ones:
            add_check(decoder, shifts, checks, y_times_r1, bit_n, value, certainty=1.0)
    return decoder.decode(tracking, checks, sorted(y_sparse)), tracking


def test_toy_decode_masked_circulant():
    """The masked full-circulant formulation recovers the toy y too."""
    params = HqcSimulationParams(Hqc128, None, None, None, WEIGHT=3, N_OVERRIDE=20)
    rng = make_random_state(0)
    y_sparse = [4, 5, 7, 9]
    Hgen = make_random_ldpc_parity_check_matrix(params.N, params.WEIGHT, rng)
    ok, tracking = _run_decode_masked(params, Hgen[0], y_sparse, only_ones=False)
    assert ok
    assert tracking.decoder_stats[-1]["good_flips"] == len(y_sparse)
    assert tracking.decoder_stats[-1]["bad_flips"] == 0
    # noiseless certainty-1.0 checks: no suspected measurement errors
    # (regression: the indicator must be c XOR e_i, not raw e_i)
    assert tracking.decoder_stats[-1]["found_bad_satisfied_checks"] == 0
    assert tracking.decoder_stats[-1]["found_bad_unsatisfied_checks"] == 0
    # stats identical to the general decoder on the same check set
    _ok_g, tracking_g = _run_decode(params, Hgen[0], y_sparse, only_ones=False)
    assert tracking.decoder_stats[-1] == tracking_g.decoder_stats[-1]
    # (only_ones on this 20-bit toy is under-determined: BP prefers the
    # all-measurements-wrong fixpoint in BOTH the general and the masked
    # formulation, so it is not a conformance point; the full-N inert-row
    # case is covered by test_attack_end_to_end_circulant_backend.)


def test_multi_plaintext_decode_masked_circulant():
    """Masked decode with checks from two circulant blocks (P=2)."""
    from sca_ldpc_tpu.models.hqc.attack import MaskedCirculantCheckDecoder

    params = HqcSimulationParams(Hqc128, None, None, None, WEIGHT=3, N_OVERRIDE=40)
    tracking = HqcSimulationTracking(params)
    y_sparse = [3, 11, 17, 29, 35]

    decoder = MaskedCirculantCheckDecoder(params)
    checks = []
    for seed in [10, 11]:
        row = random_circulant_first_row(params.N, params.WEIGHT, make_random_state(seed))
        shifts = np.flatnonzero(row)
        y_times_r1 = sparse_times_sparse(
            sorted(y_sparse), [int(i) for i in shifts], params.N
        )
        for bit_n in range(0, params.N, 2):
            add_check(
                decoder, shifts, checks, y_times_r1, bit_n,
                bit_n in y_times_r1, certainty=1.0,
            )
    assert len(decoder._block_shifts) == 2
    ok = decoder.decode(tracking, checks, sorted(y_sparse))
    assert ok

    # compile-shape bucketing knob: all-inert pad blocks must leave the
    # decode bit-identical (P=2 padded to 8 vs the unpadded default)
    tracking_p = HqcSimulationTracking(params)
    decoder.P_BUCKET = 8
    try:
        ok_p = decoder.decode(tracking_p, checks, sorted(y_sparse))
    finally:
        del decoder.P_BUCKET  # restore the class default
    assert ok_p == ok
    assert tracking.decoder_stats[-1] == tracking_p.decoder_stats[-1]


def test_toy_decode_padded():
    """PaddedCheckDecoder produces stats identical to the bucketed general
    decoder on the same check set (the fixed-capacity padding rows must be
    inert)."""
    from sca_ldpc_tpu.models.hqc.attack import PaddedCheckDecoder

    params = HqcSimulationParams(Hqc128, None, None, None, WEIGHT=3, N_OVERRIDE=20)
    rng = make_random_state(0)
    y_sparse = [4, 5, 7, 9]
    Hgen = make_random_ldpc_parity_check_matrix(params.N, params.WEIGHT, rng)
    shifts = np.flatnonzero(Hgen[0])
    y_times_r1 = sparse_times_sparse(
        sorted(y_sparse), [int(i) for i in shifts], params.N
    )

    tracking = HqcSimulationTracking(params)
    decoder = PaddedCheckDecoder(params, r_cap=64, dv_cap=4)
    checks = []
    for bit_n in range(params.N):
        add_check(
            decoder, shifts, checks, y_times_r1, bit_n,
            bit_n in y_times_r1, certainty=1.0,
        )
    ok = decoder.decode(tracking, checks, sorted(y_sparse))
    assert ok
    _ok_g, tracking_g = _run_decode(params, Hgen[0], y_sparse, only_ones=False)
    assert tracking.decoder_stats[-1] == tracking_g.decoder_stats[-1]


def test_padded_decoder_capacity_doubling():
    """Check counts beyond the initial capacity double it (rare recompile)
    instead of failing."""
    from sca_ldpc_tpu.models.hqc.attack import PaddedCheckDecoder

    params = HqcSimulationParams(Hqc128, None, None, None, WEIGHT=3, N_OVERRIDE=20)
    rng = make_random_state(0)
    y_sparse = [4, 5, 7, 9]
    Hgen = make_random_ldpc_parity_check_matrix(params.N, params.WEIGHT, rng)
    shifts = np.flatnonzero(Hgen[0])
    y_times_r1 = sparse_times_sparse(
        sorted(y_sparse), [int(i) for i in shifts], params.N
    )

    tracking = HqcSimulationTracking(params)
    decoder = PaddedCheckDecoder(params, r_cap=8, dv_cap=1)
    checks = []
    for bit_n in range(params.N):
        add_check(
            decoder, shifts, checks, y_times_r1, bit_n,
            bit_n in y_times_r1, certainty=1.0,
        )
    assert len(checks) > 8
    ok = decoder.decode(tracking, checks, sorted(y_sparse))
    assert ok
    assert decoder.r_cap >= len(checks)
    assert decoder.dv_cap >= decoder.needed_dv()


def test_attack_end_to_end_padded_backend():
    """Full HQC-128 key recovery with the fixed-capacity decoder."""
    from sca_ldpc_tpu.models.hqc import simulate_hqc_idealized_oracle

    ok, tracking = simulate_hqc_idealized_oracle(
        make_random_state(0),
        decode_every=50,
        weight=20,
        keyfile="fixtures/test-hqc128.key",
        error_rate=0.0,
        param_set="128",
        max_oracle_calls=60000,
        decode_backend="padded",
    )
    assert ok
    assert tracking.decoder_stats[-1]["success"]


def test_attack_end_to_end_circulant_backend():
    """Full HQC-128 key recovery with the single-compile-shape decoder."""
    from sca_ldpc_tpu.models.hqc import simulate_hqc_idealized_oracle

    ok, tracking = simulate_hqc_idealized_oracle(
        make_random_state(0),
        decode_every=50,
        weight=20,
        keyfile="fixtures/test-hqc128.key",
        error_rate=0.0,
        param_set="128",
        max_oracle_calls=60000,
        decode_backend="circulant",
    )
    assert ok
    assert tracking.decoder_stats[-1]["success"]


def test_attack_checkpoint_resume_bitwise(tmp_path):
    """A run killed mid-attack and resumed from its checkpoint must follow
    the EXACT trajectory of an uninterrupted run (VERDICT round-4 #2).

    Checkpoints are written at the top of every inner block-search
    iteration — the same clean point where the oracle-call budget check
    lives — so stopping on budget exhaustion leaves a checkpoint taken at
    precisely the stop state, and resuming continues the rng stream and
    state machine bit-for-bit."""
    from sca_ldpc_tpu.models.hqc import simulate_hqc_idealized_oracle

    common = dict(
        decode_every=50,
        weight=20,
        keyfile="fixtures/test-hqc128.key",
        error_rate=0.0,
        param_set="128",
        decode_backend="circulant",
    )

    ok_ref, tracking_ref = simulate_hqc_idealized_oracle(
        make_random_state(3), max_oracle_calls=60000, **common)
    assert ok_ref

    ckpt = str(tmp_path / "attack.ckpt")
    ok_cut, tracking_cut = simulate_hqc_idealized_oracle(
        make_random_state(3), max_oracle_calls=5000,
        checkpoint_path=ckpt, **common)
    assert not ok_cut  # budget exhausted mid-attack
    assert tracking_cut.num_oracle_calls < tracking_ref.num_oracle_calls

    ok_res, tracking_res = simulate_hqc_idealized_oracle(
        make_random_state(3), max_oracle_calls=60000,
        checkpoint_path=ckpt, resume=True, **common)
    assert ok_res
    # identical trajectory: same decision count, same decode history
    assert tracking_res.num_oracle_calls == tracking_ref.num_oracle_calls
    assert tracking_res.decoder_stats == tracking_ref.decoder_stats


def test_attack_checkpoint_config_mismatch(tmp_path):
    """Resuming under different attack parameters must fail loudly."""
    import pytest

    from sca_ldpc_tpu.models.hqc import simulate_hqc_idealized_oracle

    ckpt = str(tmp_path / "attack.ckpt")
    simulate_hqc_idealized_oracle(
        make_random_state(3), decode_every=50, weight=20,
        keyfile="fixtures/test-hqc128.key", error_rate=0.0, param_set="128",
        decode_backend="circulant", max_oracle_calls=5000,
        checkpoint_path=ckpt)
    with pytest.raises(ValueError, match="different attack parameters"):
        simulate_hqc_idealized_oracle(
            make_random_state(3), decode_every=100, weight=30,
            keyfile="fixtures/test-hqc128.key", error_rate=0.0,
            param_set="128", decode_backend="circulant",
            checkpoint_path=ckpt, resume=True)


def test_timing_channel_state_roundtrip():
    """TimingChannel.state_dict/load_state_dict carry every mutable field
    (checkpoint support for the physical timing attack)."""
    from sca_ldpc_tpu.models.hqc.oracle_timing import TimingChannel

    ch = TimingChannel(None, None, b"\x01\x02", gap=9000.0, margin=1200.0,
                       measure=64, rng=make_random_state(0),
                       recal_every=1200, recal_trials=20,
                       epsilon=(0.95, 0.9),
                       calibration_counts=(95.0, 100.0, 90.0, 100.0))
    ch.num_decaps = 4096
    ch.num_measurements = 32
    ch.offset = -312.5
    ch.truth_agree = [10, 20]
    ch.truth_total = [11, 22]
    ch.num_recals = 3
    ch.num_recal_decaps = 512
    ch.recal_history = [{"window_acc_fail": 0.9}]
    ch._decisions_since_recal = 7

    state = ch.state_dict()
    ch2 = TimingChannel(None, None, b"", gap=0.0,
                        rng=make_random_state(1))
    ch2.load_state_dict(state)
    for field in TimingChannel._STATE_FIELDS:
        assert getattr(ch2, field) == getattr(ch, field), field
