"""Timing-channel oracle backend: decision rule, amplification plumbing,
calibration guardrails.

The physical channel itself only exists on real hardware (the full-recovery
artifact run is documented in BASELINE.md); these tests pin the *plumbing*
with a mock channel — each amplification repeat must re-measure the right
(ct, vbit) probe, the calibrated EPSILON must flow into check certainty, and
broken channels must be rejected rather than clamped (round-1 advisor
findings).
"""

import pickle

import pytest

from sca_ldpc_tpu.models.hqc import Hqc128
from sca_ldpc_tpu.models.hqc.attack import (
    HqcOracle,
    read_or_generate_keypair,
    toggle_bits_in_v,
)
from sca_ldpc_tpu.models.hqc.oracle_timing import TimingChannel
from sca_ldpc_tpu.models.hqc.tracking import (
    HqcSimulationParams,
    HqcSimulationTracking,
)
from sca_ldpc_tpu.utils import make_random_state


class MockChannel:
    """Stands in for TimingChannel: answers from a scripted table keyed by
    the exact ciphertext bytes measured, recording every probe."""

    def __init__(self, answers):
        self.answers = answers  # ct bytes -> list of answers (popped)
        self.measured = []      # every ct measured, in order
        self.num_measurements = 0
        self.num_decaps = 0
        self.truth_agree = [0, 0]
        self.truth_total = [0, 0]

    def measure_success(self, ct):
        ct = bytes(ct)
        self.measured.append(ct)
        self.num_measurements += 1
        return self.answers[ct].pop(0)

    def record_truth(self, reported, true_answer):
        t = int(bool(true_answer))
        self.truth_total[t] += 1
        if bool(reported) == bool(true_answer):
            self.truth_agree[t] += 1


def _mini_params():
    return HqcSimulationParams(
        Hqc128, OUTER_DECODING_LIMIT=15, EPSILON=(0.9, 0.8),
        DECODE_EVERY=10, WEIGHT=3,
    )


def _oracle_with_channel(channel):
    params = _mini_params()
    tracking = HqcSimulationTracking(params)
    rng = make_random_state(0)
    HQC = params.HQC
    pub, priv = HQC.keypair()
    pt = bytes(HQC.new_plaintext())
    ct, _ = HQC.encaps_with_plaintext_and_r1(pub, pt, [])
    oracle = HqcOracle(
        params, tracking, priv, pt, rng, ct,
        backend="native", timing_channel=channel,
    )
    return oracle, params, tracking, bytes(ct)


def _bayes_post_true(k_t, k_f, acc_f, acc_t):
    lik_t = acc_t**k_t * (1 - acc_t) ** k_f
    lik_f = (1 - acc_f) ** k_t * acc_f**k_f
    return lik_t / (lik_t + lik_f)


def test_amplification_remeasures_same_probe():
    """Each amplification repeat is a fresh measurement of the SAME
    (ct, vbit) probe, and the reported certainty is the Bayesian posterior
    over both classes from the calibrated per-class accuracies."""
    # Build the oracle first with a placeholder channel to learn the base ct.
    oracle, params, tracking, base_ct = _oracle_with_channel(MockChannel({}))
    vbit = 12345
    probe_ct = bytes(toggle_bits_in_v(base_ct, [vbit], params.N))

    # EPSILON=(0.9, 0.8): one True reading gives posterior 0.8/(0.8+0.1)
    # = 0.888 < 0.95; the second lifts it to 0.64/(0.64+0.01) = 0.9846.
    channel = MockChannel({probe_ct: [True, True]})
    oracle.timing = channel

    meta = {}
    result = oracle._amplify(
        raw=True, require=(0.95, 0.95), result_meta=meta, debug=False,
        vbit=vbit,
    )
    assert result is True
    assert channel.measured == [probe_ct, probe_ct]  # same probe, re-measured
    assert meta["certainty"] == pytest.approx(_bayes_post_true(2, 0, 0.9, 0.8))
    assert tracking.num_oracle_calls == 2
    # ground-truth accounting saw both reports against raw=True
    assert channel.truth_total[1] == 2 and channel.truth_agree[1] == 2


def test_mixed_answers_weighed_by_posterior():
    """Disagreeing measurements are weighed against each other: after
    (True, False, False) the posterior favors False but only at 0.72 — the
    reference's one-sided product would already claim 0.99 — so
    amplification keeps measuring until the posterior clears the
    threshold."""
    oracle, params, tracking, base_ct = _oracle_with_channel(MockChannel({}))
    # No vbit: the probe is the oracle's own current ciphertext.
    channel = MockChannel({base_ct: [True] + [False] * 7})
    oracle.timing = channel

    meta = {}
    result = oracle._amplify(
        raw=False, require=(0.97, 0.97), result_meta=meta, debug=False,
        vbit=None,
    )
    assert result is False
    # posterior(False) after 1 True + k False readings with EPSILON=(0.9,0.8):
    # k=2: 0.717, k=3: 0.919, k=4: 0.981 >= 0.97 -> 5 measurements total
    assert len(channel.measured) == 5
    assert meta["certainty"] == pytest.approx(
        1 - _bayes_post_true(1, 4, 0.9, 0.8)
    )


def test_timing_channel_decision_margin():
    """The differential decision uses the expansion margin: probe slower
    than (ref - margin) is a success, faster is a failure."""

    class FakeHQC:
        pass

    samples = {}

    def fake_measure(HQC, priv, cts, measurements, chunk):
        return [samples[bytes(c)] for c in cts]

    import sca_ldpc_tpu.models.hqc.oracle_timing as ot

    orig = ot._measure_interleaved
    ot._measure_interleaved = fake_measure
    try:
        ch = TimingChannel(FakeHQC(), b"", b"base", gap=9000, margin=1800,
                           measure=8)
        samples[b"base"] = 100000.0
        samples[b"fail"] = 100000.0 - 3600.0   # one expansion faster
        samples[b"succ"] = 100000.0 - 900.0    # within margin
        assert ch.measure_success(b"fail") is False
        assert ch.measure_success(b"succ") is True
        # margin defaults to gap/2 when not given (midpoint rule)
        ch2 = TimingChannel(FakeHQC(), b"", b"base", gap=9000, measure=8)
        assert ch2.margin == 4500
        assert ch2.measure_success(b"fail") is True  # -3600 > -4500
    finally:
        ot._measure_interleaved = orig


def test_recalibration_recenters_and_refreshes_epsilon(monkeypatch):
    """Mid-attack drift recalibration (round-3 finding): when the measured
    success level drifts below the margin, recalibrate() re-centers the
    decision boundary on the fresh success-class median, refreshes EPSILON
    from decayed rolling tallies, and propagates it via on_update — so a
    drifted success probe that would have been misread flips back to
    correct."""
    import sca_ldpc_tpu.models.hqc.oracle_timing as ot

    HQC = Hqc128()
    rng = make_random_state(3)
    pub, priv = HQC.keypair()
    pt = bytes(HQC.new_plaintext())
    base_ct, _ = HQC.encaps_with_plaintext_and_r1(pub, pt, [])

    calls = {"n": 0}
    REF = 100000.0

    def fake_measure(HQC_, priv_, cts, measurements, chunk):
        # Call order: one pre-recal success probe (i=0), then
        # recalibrate()'s 4 fail probes (i=1..4) and 4 success probes
        # (i=5..8), then one post-recal success probe.  The success class
        # has drifted to -2000 cycles; failures sit at -12000.
        i = calls["n"]
        calls["n"] += 1
        diff = -12000.0 if 1 <= i <= 4 else -2000.0
        return [REF + diff, REF]

    monkeypatch.setattr(ot, "_measure_interleaved", fake_measure)

    updates = []
    ch = TimingChannel(
        HQC, priv, base_ct, gap=9000, margin=1800, measure=8, rng=rng,
        recal_every=50, recal_trials=4, recal_decay=0.65,
        epsilon=(0.96, 0.99), calibration_counts=(96, 100, 99, 100),
        on_update=updates.append,
    )
    # Pre-recal: a success probe drifted to -2000 cycles reads below the
    # -1800 margin -> misclassified as failure.
    assert ch.measure_success(b"\x00" * len(bytes(base_ct))) is False

    ch.recalibrate()
    # Boundary re-centered on the measured success median (-2000, within
    # the +-1.25*margin clamp); the same drifted probe now reads success.
    assert ch.offset == pytest.approx(-2000.0)
    assert ch.measure_success(b"\x00" * len(bytes(base_ct))) is True
    # Window was perfect (4/4 both classes) -> rolling tallies blend the
    # seeded calibration (96/100, 99/100) with the window at decay 0.65.
    exp_f = (0.65 * 96 + 4) / (0.65 * 100 + 4)
    exp_s = (0.65 * 99 + 4) / (0.65 * 100 + 4)
    assert ch.epsilon == pytest.approx((exp_f, min(exp_s, 0.995)))
    assert updates == [ch.epsilon]
    assert ch.num_recals == 1
    assert ch.recal_history[0]["window_acc_fail"] == 1.0
    assert ch.recal_history[0]["window_acc_success"] == 1.0
    # Recal decap accounting is separated from decision accounting.
    assert ch.num_recal_decaps == 8 * 2 * 8


def test_recalibration_auto_triggers_and_updates_attack_epsilon(monkeypatch):
    """measure_success auto-runs recalibrate() every recal_every decisions,
    and the attack adopts the refreshed EPSILON through on_update (the
    params.EPSILON pathway used by simulate_hqc_idealized_oracle)."""
    import sca_ldpc_tpu.models.hqc.oracle_timing as ot

    HQC = Hqc128()
    rng = make_random_state(4)
    pub, priv = HQC.keypair()
    pt = bytes(HQC.new_plaintext())
    base_ct, _ = HQC.encaps_with_plaintext_and_r1(pub, pt, [])

    monkeypatch.setattr(
        ot, "_measure_interleaved",
        lambda *a, **k: [100000.0 - 12000.0, 100000.0],
    )
    params = _mini_params()
    params.EPSILON = (0.9, 0.9)

    def adopt(eps):
        params.EPSILON = eps

    ch = TimingChannel(
        HQC, priv, base_ct, gap=9000, margin=1800, measure=8, rng=rng,
        recal_every=3, recal_trials=2, calibration_counts=(9, 10, 9, 10),
        on_update=adopt,
    )
    for _ in range(3):
        ch.measure_success(base_ct)
    assert ch.num_recals == 0
    ch.measure_success(base_ct)  # 4th decision crosses recal_every=3
    assert ch.num_recals == 1
    # fail probes (diff -12000) classify correctly; success probes (same
    # mocked diff) misclassify -> the refreshed EPSILON reflects the
    # broken success class and reached the attack's params.
    assert params.EPSILON == ch.epsilon
    assert ch.epsilon[0] > 0.9 and ch.epsilon[1] < 0.8


def test_calibration_rejects_broken_channel(monkeypatch):
    """A channel whose calibrated accuracy is below min_accuracy must raise
    after re-profiling, never silently clamp (advisor finding)."""
    import sca_ldpc_tpu.models.hqc.oracle_timing as ot

    monkeypatch.setattr(
        ot, "profiling_oracle", lambda *a, **k: 0.0
    )
    monkeypatch.setattr(
        ot, "profiling_oracle_interleaved",
        lambda *a, **k: (100000.0, 99000.0, 1000.0),
    )
    monkeypatch.setattr(
        ot, "profile_expansion_cost", lambda *a, **k: (500.0, 0, 0)
    )
    monkeypatch.setattr(
        ot, "measure_garbage_expansion_distribution",
        lambda *a, **k: {0: 0.9, 1: 0.08, 2: 0.015, 3: 0.005},
    )
    # Channel answers True for everything -> acc_fail == 0.
    monkeypatch.setattr(
        ot.TimingChannel, "measure_success", lambda self, ct: True
    )
    HQC = Hqc128()
    rng = make_random_state(1)
    pub, priv = HQC.keypair()
    with pytest.raises(RuntimeError, match="calibration failed"):
        ot.calibrate_timing_channel(
            HQC, rng, pub, priv, measure=4, profile_measurements=2**4,
            calibration_trials=5, max_calibration_attempts=2,
        )


def test_calibration_success_path(monkeypatch):
    """A healthy mocked channel yields channel params + per-class accuracy;
    the success class is calibrated on modified (non-identical) probes."""
    import sca_ldpc_tpu.models.hqc.oracle_timing as ot

    monkeypatch.setattr(ot, "profiling_oracle", lambda *a, **k: 0.0)
    monkeypatch.setattr(
        ot, "profiling_oracle_interleaved",
        lambda *a, **k: (100000.0, 92800.0, 7200.0),
    )
    monkeypatch.setattr(
        ot, "profile_expansion_cost", lambda *a, **k: (3600.0, 0, 0)
    )
    monkeypatch.setattr(
        ot, "measure_garbage_expansion_distribution",
        lambda *a, **k: {0: 0.9, 1: 0.08, 2: 0.015, 3: 0.005},
    )

    HQC = Hqc128()
    rng = make_random_state(2)
    pub, priv = HQC.keypair()

    base_holder = {}
    probes = {"identical": 0, "modified": 0}

    def fake_measure(self, ct):
        ct = bytes(ct)
        if ct == base_holder["base"]:
            probes["identical"] += 1
            return True
        probes["modified"] += 1
        # tell fail-probes (heavily modified) from success-probes by parity
        # of the hamming difference? Simpler: calibration calls fail first.
        return probes["modified"] > 10  # first 10 = fail class, answered F
    monkeypatch.setattr(ot.TimingChannel, "measure_success", fake_measure)

    orig_init = ot.TimingChannel.__init__

    def spy_init(self, HQC_, priv_, base_ct, gap, **kw):
        base_holder["base"] = bytes(base_ct)
        return orig_init(self, HQC_, priv_, base_ct, gap, **kw)
    monkeypatch.setattr(ot.TimingChannel, "__init__", spy_init)

    params, acc_fail, acc_success, ctnmod = ot.calibrate_timing_channel(
        HQC, rng, pub, priv, measure=4, profile_measurements=2**4,
        calibration_trials=10,
    )
    assert params["margin"] == pytest.approx(0.4 * 3600.0)
    assert params["cost"] == pytest.approx(3600.0)
    assert params["fail_ceiling"] == pytest.approx(0.995)
    assert acc_fail == 1.0 and acc_success == 1.0
    # every success-class calibration probe was a MODIFIED ciphertext
    assert probes["identical"] == 0
    assert probes["modified"] == 20


def test_read_or_generate_keypair_rejects_corrupt_file(tmp_path):
    """A corrupt or wrong-format existing key file must fail loudly, not be
    silently regenerated (round-1 verdict weakness #8)."""
    HQC = Hqc128()
    bad = tmp_path / "corrupt.key"
    bad.write_bytes(b"\x00\x01not-a-pickle")
    with pytest.raises(Exception):
        read_or_generate_keypair(HQC, str(bad))
    assert bad.read_bytes() == b"\x00\x01not-a-pickle"  # untouched

    wrong = tmp_path / "wrong.key"
    with open(wrong, "wb") as f:
        pickle.dump({"not": "a keypair"}, f)
    with pytest.raises(ValueError, match="byte pair"):
        read_or_generate_keypair(HQC, str(wrong))

    # A missing file still generates + persists a fresh keypair.
    fresh = tmp_path / "fresh.key"
    pub, priv = read_or_generate_keypair(HQC, str(fresh))
    assert isinstance(pub, (bytes, bytearray))
    pub2, priv2 = read_or_generate_keypair(HQC, str(fresh))
    assert pub2 == pub and priv2 == priv


def test_certainty_cap_bounds_amplification():
    """With CERTAINTY_CAP set (physical per-ciphertext error floor), the
    amplified certainty and the require thresholds are both capped: a
    0.9999-certainty state assertion terminates at the ceiling instead of
    looping, and the reported check certainty never exceeds the cap —
    repeats of the same probe are correlated, so the iid certainty product
    must not be trusted past the systematic floor."""
    oracle, params, tracking, base_ct = _oracle_with_channel(MockChannel({}))
    params.CERTAINTY_CAP = (0.9995, 0.9954)
    # result=True posterior after k True readings with EPSILON=(0.9, 0.8)
    # is 1/(1 + (1/8)^k): k=2 -> 0.9846, k=3 -> 0.99805 >= capped
    # threshold 0.9954; the cap holds the reported certainty there.
    channel = MockChannel({base_ct: [True] * 10})
    oracle.timing = channel

    meta = {}
    result = oracle._amplify(
        raw=True, require=(0.9999, 0.9999), result_meta=meta, debug=False,
        vbit=None,
    )
    assert result is True
    assert len(channel.measured) == 3  # terminated at the capped threshold
    assert meta["certainty"] == pytest.approx(0.9954)  # capped, not 0.998

    # Without the cap the same require needs 5 answers (posterior
    # 0.99997 >= 0.9999) and reports the raw posterior.
    del params.CERTAINTY_CAP
    channel2 = MockChannel({base_ct: [True] * 10})
    oracle.timing = channel2
    meta2 = {}
    oracle._amplify(raw=True, require=(0.9999, 0.9999), result_meta=meta2,
                    debug=False, vbit=None)
    assert len(channel2.measured) == 5
    assert meta2["certainty"] > 0.9999
