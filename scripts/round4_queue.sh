#!/bin/bash
# Round-4 measurement queue (VERDICT round-3 tasks 1-4).
#
# All steps are timing-sensitive (host rdtscp channel) and/or claim the
# single TPU, so they run strictly sequentially on a quiet machine.
# Each step logs to artifacts/logs/ and is independently checkpointed
# (partial-writer JSONs / eval-oracle state files), so a round-clock kill
# loses at most the in-flight step.  Steps are ordered by VERDICT priority:
# batched + TPU-decode timing recoveries first, then curve power, then the
# HQC-192 diagnostics, then the 16384 top-up.
set -u
cd "$(dirname "$0")/.."
LOGS=artifacts/logs
mkdir -p "$LOGS" artifacts/timing_stats
QUEUE_MARK=artifacts/timing_stats/round4_queue_progress
# Hard stop: never START a step whose estimate would run past this epoch.
# The driver needs the TPU free for bench.py at round end, and a concurrent
# JAX process would deadlock the single-chip claim (CLAUDE.md).
DEADLINE=${ROUND4_DEADLINE_EPOCH:-$(( $(date +%s) + 19000 ))}

step() {
    local name="$1" est_min="$2"; shift 2
    if grep -qx "$name" "$QUEUE_MARK" 2>/dev/null; then
        echo "[queue] $name already done, skipping"
        return 0
    fi
    if [ $(( $(date +%s) + est_min * 60 )) -gt "$DEADLINE" ]; then
        echo "[queue] $(date -u +%H:%M:%S) SKIP $name (est ${est_min}m past deadline)"
        return 0
    fi
    echo "[queue] $(date -u +%H:%M:%S) START $name: $*"
    "$@" >"$LOGS/${name}_r4.log" 2>&1
    local rc=$?
    echo "[queue] $(date -u +%H:%M:%S) END $name rc=$rc"
    if [ $rc -eq 0 ]; then echo "$name" >>"$QUEUE_MARK"; fi
    return 0
}

# 1. Batched 2-instance timing attack, TPU circulant decode (~2h est).
step batched_2x128 140 timeout 10800 python scripts/timing_attack_batched.py \
    --seeds 7 8 --out artifacts/timing_stats/timing_batched_2x128.json

# 2. Single timing recovery, TPU circulant decode backend (drift-recal on).
step s4_tpu 75 timeout 5400 python scripts/timing_attack_stats.py --runs 128-s4-tpu

# 3. Single timing recovery, CPU general backend (brings completed rows to >=5).
step s3_cpu 75 timeout 5400 python scripts/timing_attack_stats.py --runs 128-s3-cpu

# 4. Plateau power: top up 1024/2048/4096 to 1000 trials each (~50 min).
step plateau 80 timeout 7200 python -m sca_ldpc_tpu.cli.main hqc_eval_oracle \
    --key-file artifacts/eval_oracle.key \
    --csv-output artifacts/hqc128_oracle_accuracy_linear.csv \
    --state-file artifacts/hqc128_oracle_accuracy_linear.state.json \
    --trials 1000 --max-log2-measurements 15 --profile-log2 16 \
    --only-levels 1024 2048 4096

# 5. HQC-192 channel root-cause diagnostics (phases A+B+C).
step diag192 60 timeout 5400 python scripts/hqc192_diagnostics.py \
    --out artifacts/hqc192_channel_diagnostics.json

# 6. 16384 fresh-1000-trial treatment (~90 min).
step lvl16384 110 timeout 9000 python -m sca_ldpc_tpu.cli.main hqc_eval_oracle \
    --key-file artifacts/eval_oracle.key \
    --csv-output artifacts/hqc128_oracle_accuracy_linear.csv \
    --state-file artifacts/hqc128_oracle_accuracy_linear.state.json \
    --trials 1000 --max-log2-measurements 15 --profile-log2 16 \
    --only-levels 16384

# 7. Bonus if the round clock allows: 2^15 at 1000 trials (checkpointable;
#    a partial state file still extends the committed curve's range).
step lvl32768 260 timeout 18000 python -m sca_ldpc_tpu.cli.main hqc_eval_oracle \
    --key-file artifacts/eval_oracle.key \
    --csv-output artifacts/hqc128_oracle_accuracy_linear.csv \
    --state-file artifacts/hqc128_oracle_accuracy_linear.state.json \
    --trials 1000 --max-log2-measurements 16 --profile-log2 16 \
    --only-levels 32768

echo "[queue] all steps done"
