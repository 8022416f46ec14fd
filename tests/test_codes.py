"""Conformance tests for code construction.

Golden values are the reference's doctest outputs (simulate/make_code.py,
simulate/distance_spectrum.py) — fixed seeds must reproduce the same matrices
because the RNG draw sequences are kept identical.
"""

import numpy as np
from sca_ldpc_tpu.codes import (
    CodeLayout,
    CirculantLayout,
    calc_ds,
    check_ds_addition_limit,
    fixed_weight_vec,
    gen_array_ds_multiplicity,
    make_qc_parity_check_matrix,
    make_random_ldpc_parity_check_matrix,
    make_random_ldpc_parity_check_matrix_with_identity,
    make_regular_ldpc_parity_check_matrix,
    make_regular_ldpc_parity_check_matrix_identity,
)
from sca_ldpc_tpu.utils import make_random_state


def test_make_random_state_golden():
    rng = make_random_state(0)
    assert rng.randint(0, 100) == 44
    rng = make_random_state(rng)
    assert rng.randint(0, 100) == 47


def test_fixed_weight_vec_golden():
    got = fixed_weight_vec(10, 3, make_random_state(0))
    assert got.tolist() == [1, 0, 0, 1, 0, 1, 0, 0, 0, 0]


def test_calc_ds_golden():
    a = np.array([1, 1, 0, 1, 0, 0, 1, 0, 0, 0])
    assert calc_ds(a).tolist() == [0, 1, 1, 2, 1, 1]


def test_check_ds_addition_limit_golden():
    a = np.array([1, 1, 0, 1, 0, 0, 0, 0, 0, 0])
    ds = calc_ds(a)
    got = check_ds_addition_limit(a, ds, 6, 2)
    assert got.tolist() == [0, 1, 1, 2, 1, 1]
    # Exceeding the limit returns False
    assert check_ds_addition_limit(a, ds, 6, 1) is False


def test_gen_array_ds_multiplicity_golden():
    rng = make_random_state(0)
    a = gen_array_ds_multiplicity(10, 3, 1, rng)
    assert a.tolist() == [0, 0, 1, 0, 0, 0, 0, 0, 1, 1]
    assert calc_ds(a).tolist() == [0, 1, 0, 1, 1, 0]
    a = gen_array_ds_multiplicity(10, 4, 2, rng)
    assert a.tolist() == [0, 1, 1, 1, 0, 1, 0, 0, 0, 0]
    assert calc_ds(a).tolist() == [0, 2, 2, 1, 1, 0]


def test_make_qc_parity_check_matrix_golden():
    got = make_qc_parity_check_matrix(6, 2, 2, make_random_state(0))
    expected = [
        [1, 0, 1, 0, 0, 0, 0, 0, 0, 1, 0, 1, 1, 0, 0, 0, 0, 0],
        [0, 1, 0, 1, 0, 0, 1, 0, 0, 0, 1, 0, 0, 1, 0, 0, 0, 0],
        [0, 0, 1, 0, 1, 0, 0, 1, 0, 0, 0, 1, 0, 0, 1, 0, 0, 0],
        [0, 0, 0, 1, 0, 1, 1, 0, 1, 0, 0, 0, 0, 0, 0, 1, 0, 0],
        [1, 0, 0, 0, 1, 0, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 1, 0],
        [0, 1, 0, 0, 0, 1, 0, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 1],
    ]
    assert got.tolist() == expected


def test_make_regular_ldpc_golden():
    got = make_regular_ldpc_parity_check_matrix(6, 4, 2, 3, make_random_state(0))
    expected = [
        [1, 1, 1, 0, 0, 0],
        [0, 0, 0, 1, 1, 1],
        [0, 1, 1, 0, 1, 0],
        [1, 0, 0, 1, 0, 1],
    ]
    assert got.tolist() == expected


def test_make_regular_ldpc_identity_golden():
    got = make_regular_ldpc_parity_check_matrix_identity(6, 4, 2, 3, make_random_state(0))
    expected = [
        [1, 1, 1, 0, 0, 0, 1, 0, 0, 0],
        [0, 0, 0, 1, 1, 1, 0, 1, 0, 0],
        [0, 1, 1, 0, 1, 0, 0, 0, 1, 0],
        [1, 0, 0, 1, 0, 1, 0, 0, 0, 1],
    ]
    assert got.tolist() == expected


def test_make_random_ldpc_golden():
    got = make_random_ldpc_parity_check_matrix(10, 3, make_random_state(0))
    expected_first_row = [0, 1, 1, 0, 0, 0, 0, 0, 1, 0]
    assert got[0].tolist() == expected_first_row
    # circulant structure: row i is row 0 shifted right by i
    assert got[1].tolist() == [0, 0, 1, 1, 0, 0, 0, 0, 0, 1]
    assert got[9].tolist() == [1, 1, 0, 0, 0, 0, 0, 1, 0, 0]


def test_make_random_ldpc_with_identity_golden():
    got = make_random_ldpc_parity_check_matrix_with_identity(10, 3, make_random_state(0))
    assert got.shape == (10, 20)
    assert got[0].tolist() == [0, 1, 1, 0, 0, 0, 0, 0, 1, 0] + [1] + [0] * 9
    assert (got[:, 10:] == np.identity(10, dtype=int)).all()


def test_regular_matrix_is_regular():
    H = make_regular_ldpc_parity_check_matrix(300, 150, 3, 6, make_random_state(1))
    assert (H.sum(axis=0) == 3).all()
    assert (H.sum(axis=1) == 6).all()


def test_code_layout_roundtrip():
    H = make_regular_ldpc_parity_check_matrix_identity(12, 8, 2, 3, make_random_state(0))
    lay = CodeLayout.from_h(H)
    assert lay.n == 20 and lay.r == 8
    assert lay.n_edges == int(np.count_nonzero(H))
    # Reconstruct H from the layout
    H2 = np.zeros_like(H)
    for i in range(lay.r):
        for t in range(lay.dc):
            if lay.chk_mask[i, t]:
                H2[i, lay.chk_var[i, t]] = lay.chk_sign[i, t]
    assert (H2 == H).all()
    # var_flat points back at the owning (check, slot)
    for j in range(lay.n):
        for t in range(lay.dv):
            if lay.var_mask[j, t]:
                flat = lay.var_flat[j, t]
                i, sc = divmod(int(flat), lay.dc)
                assert lay.chk_var[i, sc] == j


def test_circulant_layout_matches_dense():
    from sca_ldpc_tpu.codes.make_code import random_circulant_first_row

    row = random_circulant_first_row(16, 4, make_random_state(3))
    lay = CirculantLayout.from_first_row(row, with_identity=True)
    H = lay.to_dense()
    ref = make_random_ldpc_parity_check_matrix_with_identity(16, 4, make_random_state(3))
    assert (H == ref).all()
