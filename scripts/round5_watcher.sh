#!/bin/bash
# Waits for the HQC-192 timing recovery (by PID) to exit, then starts the
# round-5 post-attack queue IF the recovery artifact reports success.
# On failure/timeout it leaves a marker and does nothing (the checkpoint
# file makes the attack resumable; a human/agent decides what's next).
PID=$1
cd /root/repo
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
sleep 5
python - <<'EOF'
import json, sys
try:
    a = json.load(open("artifacts/timing_stats/timing_192-s6-tpu.json"))
except Exception:
    sys.exit(1)
sys.exit(0 if a.get("success") and not a.get("partial") else 1)
EOF
if [ $? -eq 0 ]; then
    echo "attack succeeded; starting queue" > artifacts/logs/r5_watcher_status
    bash scripts/round5_queue.sh
else
    echo "attack did not complete; queue NOT started (resume with
scripts/timing_attack_stats.py --runs 192-s6-tpu)" \
        > artifacts/logs/r5_watcher_status
fi
