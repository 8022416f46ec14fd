"""Visualization data-pipeline conformance (reference: visualize.py:59-119)."""

import numpy as np
import pandas as pd
import pytest

from sca_ldpc_tpu.viz import load_data, wide_to_long_format
from sca_ldpc_tpu.viz.plots import REFERENCE_ORACLE_ACCURACY, round_stride_of_type


def _sample_wide(tmp_path):
    rows = []
    for i, (checks, calls, good, bad) in enumerate(
        [(100, 1000, 10, 2), (200, 2100, 30, 1), (300, 3300, 66, 0)]
    ):
        rows.append(
            {
                "label": "t", "alg": "hqc-128", "weight": 20,
                "epsilon0": 0.9942, "epsilon1": 1.0,
                "checks": checks, "oracle_calls": calls, "unsatisfied": 40 + i,
                "good_flips": good, "bad_flips": bad,
                "found_bad_satisfied_checks": 1, "found_bad_unsatisfied_checks": 2,
                "success": i == 2,
            }
        )
    df = pd.DataFrame(rows)
    p = tmp_path / "stats.csv"
    df.to_csv(p, index=False)
    return p, df


def test_wide_to_long_shape(tmp_path):
    _p, df = _sample_wide(tmp_path)
    df = df.copy()
    df["remaining-flips"] = df["good_flips"].max() + df["bad_flips"] - df["good_flips"]
    df["found_bad_checks"] = (
        df["found_bad_unsatisfied_checks"] + df["found_bad_satisfied_checks"]
    )
    long = wide_to_long_format(df)
    # 3 stride types x 6 count types x 3 rows
    assert len(long) == 3 * 6 * 3
    assert set(long["stride_type"].cat.categories) == {
        "checks", "oracle_calls", "unsatisfied"
    }
    # derived column semantics (visualize.py:106-111)
    rem = long.query("stride_type == 'checks' and count_type == 'remaining-flips'")
    assert sorted(rem["count"]) == [0, 37, 58]  # 66+2-10, 66+1-30, 66+0-66


def test_load_data_rounds_strides(tmp_path):
    p, _ = _sample_wide(tmp_path)
    long = load_data(str(p))
    calls = long.query("stride_type == 'oracle_calls'")["stride"].unique()
    # oracle_calls rounded to multiples of 500 (visualize.py:116)
    assert all(c % 500 == 0 for c in calls)
    unsat = long.query("stride_type == 'unsatisfied'")["stride"].unique()
    assert all(u % 20 == 0 for u in unsat)


def test_round_stride_of_type():
    df = pd.DataFrame(
        {"stride_type": ["oracle_calls", "checks"], "stride": [1749, 1749]}
    )
    df["stride_type"] = df["stride_type"].astype("category")
    out = round_stride_of_type(df.copy(), "oracle_calls", 500)
    assert out.loc[0, "stride"] == 1500  # (1749+250)//500*500
    assert out.loc[1, "stride"] == 1749  # untouched


def test_reference_accuracy_curve_shape():
    assert len(REFERENCE_ORACLE_ACCURACY) == 17
    assert REFERENCE_ORACLE_ACCURACY[0] == 0.0
    assert max(REFERENCE_ORACLE_ACCURACY) <= 1.0
