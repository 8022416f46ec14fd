"""Pallas circulant-BP kernel conformance (interpreter mode on CPU; the
compiled path is exercised on hardware by bench.py and __graft_entry__)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sca_ldpc_tpu.codes.layout import CirculantLayout
from sca_ldpc_tpu.codes.make_code import random_circulant_first_row
from sca_ldpc_tpu.ops.circulant_bp import _circulant_bp
from sca_ldpc_tpu.utils import make_random_state


@pytest.mark.parametrize("method", ["product_sum", "min_sum"])
def test_pallas_matches_xla(method):
    from jax.experimental.pallas import tpu as pltpu

    from sca_ldpc_tpu.ops.kernels.circulant_pallas import circulant_bp_pallas

    rng = make_random_state(5)
    n, w = 128, 4
    row = random_circulant_first_row(n, w, rng)
    lay = CirculantLayout.from_first_row(row, with_identity=True)
    B = 8
    err = np.zeros((B, 2 * n), np.int32)
    for i in range(B):
        err[i, rng.choice(2 * n, 1 + i % 2, replace=False)] = 1
    H = lay.to_dense()
    syn = (err @ H.T) % 2
    p = 0.01
    prior = float(np.log((1 - p) / p))
    pc = jnp.full((B, n), prior, jnp.float32)
    pi = jnp.full((B, n), prior, jnp.float32)
    synj = jnp.asarray(syn, jnp.int32)

    with pltpu.force_tpu_interpret_mode():
        e_pal, conv_pal = circulant_bp_pallas(
            pc, pi, synj, lay.shifts, 20, tb=8, method=method
        )
    e_xla, conv_xla, _ = _circulant_bp(pc, pi, synj, lay.shifts, True, 20, method)

    assert (np.asarray(e_pal) == err).all()
    assert np.asarray(conv_pal).all()
    assert (np.asarray(e_pal) == np.asarray(e_xla)).all()
