"""Timing-oracle evaluation: checkpoint/resume and trial-schedule behavior.

Reference: simulate/hqc_eval_oracle.py:58-113 (profiling -> threshold ->
accuracy sweep).  These run the REAL native pipeline at tiny measurement
counts — they validate the sweep mechanics, not the accuracy values (the
full-scale curve is an artifact run, artifacts/hqc128_oracle_accuracy.csv).
"""

import json

import pytest

from sca_ldpc_tpu.models.hqc.eval_oracle import hqc_eval_oracle
from sca_ldpc_tpu.utils import make_random_state


def test_eval_oracle_checkpoint_and_resume(tmp_path):
    state_file = str(tmp_path / "state.json")
    key_file = str(tmp_path / "key.key")

    results = hqc_eval_oracle(
        make_random_state(3),
        keyfile=key_file,
        num_trials=3,
        max_log2_measurements=2,
        profile_measurements=2**6,
        state_file=state_file,
    )
    assert sorted(results) == [1, 2]
    assert all(0.0 <= a <= 1.0 for a in results.values())

    with open(state_file) as f:
        state = json.load(f)
    assert "threshold" in state
    assert state["levels"]["1"]["done"] == 3
    assert state["levels"]["2"]["done"] == 3
    threshold = state["threshold"]

    # Resume with a higher trial target: profiling must be skipped (same
    # threshold) and tallies continue from the checkpoint.
    results2 = hqc_eval_oracle(
        make_random_state(4),
        keyfile=key_file,
        num_trials=5,
        max_log2_measurements=2,
        profile_measurements=2**6,
        state_file=state_file,
    )
    with open(state_file) as f:
        state2 = json.load(f)
    assert state2["threshold"] == threshold
    assert state2["levels"]["1"]["done"] == 5
    assert state2["levels"]["2"]["done"] == 5
    assert sorted(results2) == [1, 2]

    # Reduced-trial schedule: levels >= 2**reduced_from_log2 use the reduced
    # target; already-exceeded tallies are kept, new levels stop early.
    results3 = hqc_eval_oracle(
        make_random_state(5),
        keyfile=key_file,
        num_trials=5,
        max_log2_measurements=3,
        profile_measurements=2**6,
        reduced_trials=2,
        reduced_from_log2=2,
        state_file=state_file,
    )
    with open(state_file) as f:
        state3 = json.load(f)
    assert state3["levels"]["1"]["done"] == 5  # kept (target already met)
    assert state3["levels"]["4"]["done"] == 2  # reduced target
    assert sorted(results3) == [1, 2, 4]

    # A state recorded under one trial mode must not be silently reused
    # under another (the tallies would mix decision rules).
    with pytest.raises(ValueError, match="trial_mode"):
        hqc_eval_oracle(
            make_random_state(6),
            keyfile=key_file,
            num_trials=1,
            max_log2_measurements=1,
            profile_measurements=2**6,
            state_file=state_file,
            trial_mode="threshold",
        )

    # Tallies measured under one interleave-chunk cap must not mix with
    # another (the drift-cancellation granularity differs); states that
    # predate the knob count as chunk_cap=None.
    with pytest.raises(ValueError, match="chunk_cap"):
        hqc_eval_oracle(
            make_random_state(6), keyfile=key_file, num_trials=1,
            max_log2_measurements=1, profile_measurements=2**6,
            state_file=state_file, chunk_cap=64,
        )

    # A state profiled under a different keypair is stale (the key file was
    # silently regenerated): refuse to resume.
    state3["key_fingerprint"] = "0" * 64
    with open(state_file, "w") as f:
        json.dump(state3, f)
    with pytest.raises(ValueError, match="keypair"):
        hqc_eval_oracle(
            make_random_state(6), keyfile=key_file, num_trials=1,
            max_log2_measurements=1, profile_measurements=2**6,
            state_file=state_file,
        )

    # Pre-upgrade states (no trial_mode/gap recorded) cannot be resumed —
    # the decision rule that produced their tallies is unknown.
    del state3["trial_mode"]
    with open(state_file, "w") as f:
        json.dump(state3, f)
    with pytest.raises(ValueError, match="predates"):
        hqc_eval_oracle(
            make_random_state(6), keyfile=key_file, num_trials=1,
            max_log2_measurements=1, profile_measurements=2**6,
            state_file=state_file,
        )


def test_eval_oracle_incremental_csv(tmp_path):
    """The accuracy-curve CSV is (re)written at every checkpoint, so a long
    sweep killed mid-level still leaves the completed levels on disk."""
    csv_file = str(tmp_path / "curve.csv")
    results = hqc_eval_oracle(
        make_random_state(9),
        keyfile=str(tmp_path / "key.key"),
        num_trials=3,
        max_log2_measurements=2,
        profile_measurements=2**6,
        state_file=str(tmp_path / "state.json"),
        checkpoint_every=1,  # every trial checkpoints -> CSV exists mid-level
        csv_output=csv_file,
    )
    with open(csv_file) as f:
        lines = f.read().strip().splitlines()
    assert lines[0] == ("measurements,accuracy,trials,decaps_per_decision,"
                        "quiet_accuracy,quiet_trials,mean_loadavg")
    rows = [ln.split(",") for ln in lines[1:]]
    assert [int(r[0]) for r in rows] == [1, 2]
    for r in rows:
        m, acc, trials, dpd = int(r[0]), float(r[1]), int(r[2]), int(r[3])
        assert acc == pytest.approx(results[m])
        assert trials == 3
        assert dpd == 2 * m  # differential mode: 2x measure decaps/decision
        # ambient-condition covariate columns: every trial records load;
        # quiet trials are a (possibly empty) subset of counted ones
        quiet_trials = int(r[5]) if r[5] else 0
        assert 0 <= quiet_trials <= trials
        if quiet_trials:
            assert 0.0 <= float(r[4]) <= 1.0
        assert float(r[6]) >= 0.0  # mean loadavg recorded for new levels


def test_eval_oracle_reference_modes(tmp_path):
    """The reference's sequential-profiling + absolute-threshold pipeline
    (hqc_eval_oracle.py:39-112) stays available behind the mode knobs."""
    results = hqc_eval_oracle(
        make_random_state(8),
        keyfile=str(tmp_path / "key.key"),
        num_trials=2,
        max_log2_measurements=2,
        profile_measurements=2**6,
        profile_mode="sequential",
        trial_mode="threshold",
    )
    assert sorted(results) == [1, 2]
    assert all(0.0 <= a <= 1.0 for a in results.values())
