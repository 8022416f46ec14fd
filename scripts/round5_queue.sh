#!/bin/bash
# Round-5 post-attack work queue.  Started by round5_watcher.sh the moment
# the HQC-192 timing recovery exits successfully; everything here needs
# the machine to itself (timing runs) or at least no concurrent JAX
# process (CLAUDE.md), so it is strictly sequential.
#
#   1. full test suite (validates the batched checkpoint-resume test
#      added while the attack owned the channel)
#   2. HQC-256 timing-channel diagnostics (VERDICT r4 #6)
#   3. Kyber FP/FN noise curve at 32 runs x 2 accuracies (VERDICT r4 #7)
#   4. oracle-accuracy level 2^15 at 1000 trials, resumable state file —
#      runs until the round clock stops it (VERDICT r4 #3)
set -x
cd /root/repo

timeout 900 python -m pytest tests/ -q 2>&1 | tail -3 \
    > artifacts/logs/r5_queue_pytest.log

timeout 4200 python scripts/hqc192_diagnostics.py --param-set 256 \
    > artifacts/logs/r5_queue_diag256.log 2>&1

timeout 4200 python scripts/kyber_noise_curve.py \
    --out artifacts/kyber768_noise_curve.csv \
    > artifacts/logs/r5_queue_kyber.log 2>&1

# 3b. plateau-level top-up to 2000 trials: the NEW 1000 trials carry the
# per-trial load covariate, so the quiet_* CSV columns directly answer
# whether the round-4 256-512-vs-1024-4096 inversion is weather or channel
# (VERDICT r4 #5).  ~1 h.
timeout 5400 python -m sca_ldpc_tpu.cli.main hqc_eval_oracle \
    --seed 1 --key-file artifacts/eval_oracle.key \
    --profile-log2 16 --max-log2-measurements 16 \
    --trials 2000 --only-levels 256 512 1024 2048 4096 \
    --state-file artifacts/hqc128_oracle_accuracy_linear.state.json \
    --csv-output artifacts/hqc128_oracle_accuracy_linear.csv \
    > artifacts/logs/r5_queue_evaltopup.log 2>&1

timeout 14400 python -m sca_ldpc_tpu.cli.main hqc_eval_oracle \
    --seed 1 --key-file artifacts/eval_oracle.key \
    --profile-log2 16 --max-log2-measurements 16 \
    --trials 1000 --only-levels 32768 \
    --state-file artifacts/hqc128_oracle_accuracy_linear.state.json \
    --csv-output artifacts/hqc128_oracle_accuracy_linear.csv \
    > artifacts/logs/r5_queue_eval32768.log 2>&1

echo "queue complete" > artifacts/logs/r5_queue_done
