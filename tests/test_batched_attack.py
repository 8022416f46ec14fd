"""Batched multi-instance attack orchestration (SURVEY §7.4)."""

import pytest

from sca_ldpc_tpu.models.hqc import simulate_hqc_attacks_batched


@pytest.mark.slow
def test_two_instances_batched_decode():
    results, batched_calls = simulate_hqc_attacks_batched(
        [101, 202], decode_every=100, weight=20, max_oracle_calls=60000
    )
    assert len(results) == 2
    for ok, tracking in results:
        assert ok, "instance failed to recover its key"
        assert tracking.decoder_stats[-1]["success"]
        assert tracking.decoder_stats[-1]["bad_flips"] == 0
    assert batched_calls >= 1


@pytest.mark.slow
def test_two_instances_batched_padded_decode():
    """Fixed-capacity batched decodes: one compile shape for the whole
    multi-instance attack (BatchedPaddedDecodeExecutor)."""
    results, batched_calls = simulate_hqc_attacks_batched(
        [101, 202], decode_every=100, weight=20, max_oracle_calls=60000,
        decode_backend="padded",
    )
    assert len(results) == 2
    for ok, tracking in results:
        assert ok, "instance failed to recover its key"
        assert tracking.decoder_stats[-1]["success"]
        assert tracking.decoder_stats[-1]["bad_flips"] == 0
    assert batched_calls >= 1


@pytest.mark.slow
def test_two_instances_batched_circulant_decode():
    """Masked full-circulant batched decodes: all instances share one
    compiled (N, P, W) program regardless of their random circulants."""
    results, batched_calls = simulate_hqc_attacks_batched(
        [101, 202], decode_every=100, weight=20, max_oracle_calls=60000,
        decode_backend="circulant",
    )
    assert len(results) == 2
    for ok, tracking in results:
        assert ok, "instance failed to recover its key"
        assert tracking.decoder_stats[-1]["success"]
        assert tracking.decoder_stats[-1]["bad_flips"] == 0
    assert batched_calls >= 1


@pytest.mark.slow
def test_batched_checkpoint_resume(tmp_path):
    """A batched run killed mid-attack (budget exhaustion, same clean
    point as checkpointing) resumes per-instance from checkpoint_dir and
    recovers both original keys (VERDICT round-4 #2, batched case)."""
    import os

    ckpt_dir = str(tmp_path / "ckpts")
    results_cut, _ = simulate_hqc_attacks_batched(
        [101, 202], decode_every=100, weight=20, max_oracle_calls=4000,
        decode_backend="circulant", checkpoint_dir=ckpt_dir,
    )
    assert all(not ok for ok, _t in results_cut)  # both stopped on budget
    ckpts = sorted(os.listdir(ckpt_dir))
    assert ckpts == ["instance_101.ckpt", "instance_202.ckpt"]

    results, _ = simulate_hqc_attacks_batched(
        [101, 202], decode_every=100, weight=20, max_oracle_calls=60000,
        decode_backend="circulant", checkpoint_dir=ckpt_dir,
    )
    for (ok, tracking), (_cut_ok, cut_tracking) in zip(results, results_cut):
        assert ok, "resumed instance failed to recover its key"
        # the resumed run continued the interrupted state, not a fresh one
        assert tracking.num_oracle_calls > cut_tracking.num_oracle_calls
    # recovered instances delete their checkpoints (must not resume again)
    assert sorted(os.listdir(ckpt_dir)) == []
