#!/usr/bin/env python
"""Ambient-condition analysis of timing-attack recalibration histories.

Round-5 recal entries carry a 1-min load-average covariate (VERDICT r4
weak #3/#6: quiet-window and degraded measurements were summed into one
number).  This script decomposes each run's recalibration windows by
ambient load and reports per-condition channel accuracy — the evidence
for "the channel is X quiet, Y under load" claims in docs/TIMING.md.

    python scripts/timing_conditions.py            # all runs with covariates
"""

import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The measuring process contributes ~1.0; ambient = loadavg - 1.
QUIET_AMBIENT = 0.35


def analyze(path):
    a = json.load(open(path))
    hist = a.get("recalibration_history") or []
    rows = [h for h in hist if "loadavg" in h]
    if not rows:
        return None
    load = np.array([h["loadavg"] for h in rows])
    accf = np.array([h["window_acc_fail"] for h in rows])
    accs = np.array([h["window_acc_success"] for h in rows])
    quiet = load < (1.0 + QUIET_AMBIENT)
    out = {
        "run": os.path.basename(path),
        "windows": len(rows),
        "windows_quiet": int(quiet.sum()),
        "mean_loadavg": round(float(load.mean()), 3),
        "max_loadavg": round(float(load.max()), 3),
        "acc_fail_all": round(float(accf.mean()), 3),
        "acc_success_all": round(float(accs.mean()), 3),
    }
    if quiet.any():
        out["acc_fail_quiet"] = round(float(accf[quiet].mean()), 3)
        out["acc_success_quiet"] = round(float(accs[quiet].mean()), 3)
    if (~quiet).any():
        out["acc_fail_busy"] = round(float(accf[~quiet].mean()), 3)
        out["acc_success_busy"] = round(float(accs[~quiet].mean()), 3)
    # load-accuracy correlation (only meaningful with load variance)
    if len(rows) >= 8 and load.std() > 0.01:
        out["corr_load_acc_success"] = round(
            float(np.corrcoef(load, accs)[0, 1]), 3)
        out["corr_load_acc_fail"] = round(
            float(np.corrcoef(load, accf)[0, 1]), 3)
    return out


def main():
    paths = sorted(glob.glob("artifacts/timing_stats/timing_*.json"))
    results = [r for r in (analyze(p) for p in paths) if r]
    for r in results:
        print(json.dumps(r))
    with open("artifacts/timing_conditions.json", "w") as f:
        json.dump({"quiet_ambient_threshold": QUIET_AMBIENT,
                   "runs": results}, f, indent=1)
    print(f"\nwrote artifacts/timing_conditions.json ({len(results)} runs "
          "with covariates)")


if __name__ == "__main__":
    main()
