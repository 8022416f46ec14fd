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


def test_pallas_compact_decodes_like_full():
    """The compact (reduced-VMEM, bf16-extrinsic) variant for HQC-192/256
    sizes recovers the same errors as the full-cache kernel on correctable
    frames — bf16 extrinsics on top of already-bf16 messages must not
    change hard decisions at attack operating points."""
    from jax.experimental.pallas import tpu as pltpu

    from sca_ldpc_tpu.ops.kernels.circulant_pallas import circulant_bp_pallas

    rng = make_random_state(9)
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
        e_full, conv_full = circulant_bp_pallas(
            pc, pi, synj, lay.shifts, 20, tb=4, method="product_sum"
        )
        e_cpt, conv_cpt = circulant_bp_pallas(
            pc, pi, synj, lay.shifts, 20, tb=4, method="product_sum",
            compact=True,
        )
    assert (np.asarray(e_full) == err).all()
    assert (np.asarray(e_cpt) == err).all()
    assert np.asarray(conv_full).all() and np.asarray(conv_cpt).all()


import pytest as _pytest


@_pytest.mark.parametrize("n", [128, 150])
def test_pallas_lean_matches_full(n):
    """The lean (loop-rolled, shifts-as-data) kernels decode and classify
    like the unrolled ones.  This is the VMEM-feasible path for HQC-256
    (the unrolled kernels' register spills measurably exceed 128 MB
    there) and compiles once for every weight-w circulant.  n=150
    exercises the lane-alignment padding (mod-n rotation composed from
    two aligned rolls; Mosaic rejects dynamic rolls on unaligned axes)."""
    import jax
    from jax.experimental.pallas import tpu as pltpu

    from sca_ldpc_tpu.ops.kernels.circulant_pallas import (
        circulant_bp_pallas,
        circulant_bp_pallas_lean,
        circulant_fer_pallas,
        circulant_fer_pallas_lean,
    )

    rng = make_random_state(5)
    w = 4
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
        e_lean, conv_lean = circulant_bp_pallas_lean(
            pc, pi, synj, np.asarray(lay.shifts), w, 20, tb=4
        )
    assert (np.asarray(e_lean) == err).all()
    assert np.asarray(conv_lean).all()

    # FER variant: same success flags as the unrolled kernel on random noise
    key = jax.random.PRNGKey(3)
    e_noise = (jax.random.uniform(key, (B, 2 * n)) < 0.01).astype(jnp.int8)
    with pltpu.force_tpu_interpret_mode():
        ok_full, _ = circulant_fer_pallas(e_noise, lay.shifts, 0.01, 20, tb=4)
        ok_lean, _ = circulant_fer_pallas_lean(
            e_noise, np.asarray(lay.shifts), w, 0.01, 20, tb=4
        )
    assert (np.asarray(ok_full) == np.asarray(ok_lean)).all()

    # Static-shifts variant (shifts compiled in, no pad composition — the
    # round-3 HQC-256 throughput path): identical decode and FER flags.
    with pltpu.force_tpu_interpret_mode():
        e_st, conv_st = circulant_bp_pallas_lean(
            pc, pi, synj, np.asarray(lay.shifts), w, 20, tb=4,
            static_shifts=tuple(int(k) for k in lay.shifts),
        )
        ok_st, _ = circulant_fer_pallas_lean(
            e_noise, np.asarray(lay.shifts), w, 0.01, 20, tb=4,
            static_shifts=tuple(int(k) for k in lay.shifts),
        )
    assert (np.asarray(e_st) == err).all()
    assert np.asarray(conv_st).all()
    assert (np.asarray(ok_full) == np.asarray(ok_st)).all()


def test_qary_check_kernel_matches_minplus():
    """chain_exclusive_pallas is bitwise-equal to minplus.chain_exclusive."""
    from jax.experimental.pallas import tpu as pltpu

    from sca_ldpc_tpu.ops import minplus
    from sca_ldpc_tpu.ops.kernels.qary_pallas import chain_exclusive_pallas

    rng = np.random.RandomState(0)
    bt, r, dc, q = 16, 10, 7, 15
    b = (q - 1) // 2
    s_mid = (dc - 1) * b
    v2c = (rng.rand(bt, r, dc, q) * 20).astype(np.float32)
    v2c[rng.rand(*v2c.shape) < 0.1] = minplus.BIG  # pad-like BIG entries

    ref = np.asarray(minplus.chain_exclusive(jnp.asarray(v2c), s_mid, s_out=b))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(chain_exclusive_pallas(jnp.asarray(v2c), s_mid, b, tb=8))
    assert (ref == out).all()

    # two-alphabet variant (extra operand) + non-multiple-of-tb batch
    sw, b2 = 6, 2
    se = sw * b2
    s_mid2 = (2 * sw - 1) * b2
    v2c2 = (rng.rand(11, r, sw, 2 * b2 + 1) * 20).astype(np.float32)
    extra = (rng.rand(11, r, 2 * se + 1) * 20).astype(np.float32)
    ref2 = np.asarray(
        minplus.chain_exclusive(
            jnp.asarray(v2c2), s_mid2, extra=jnp.asarray(extra), s_out=b2
        )
    )
    with pltpu.force_tpu_interpret_mode():
        out2 = np.asarray(
            chain_exclusive_pallas(
                jnp.asarray(v2c2), s_mid2, b2, extra=jnp.asarray(extra), tb=8
            )
        )
    assert (ref2 == out2).all()


def test_qary_decoder_pallas_backend_matches_xla():
    """Full q-ary decode with backend='pallas' equals backend='xla' bitwise."""
    from jax.experimental.pallas import tpu as pltpu

    from sca_ldpc_tpu.codes import make_qary_qc_parity_check_matrix
    from sca_ldpc_tpu.ops import QaryDecoder
    from sca_ldpc_tpu.utils import make_random_state

    rng = make_random_state(3)
    H = make_qary_qc_parity_check_matrix(30, 4, 2, rng)
    b = 2
    q = 2 * b + 1
    probs = np.random.RandomState(7).dirichlet(np.ones(q), size=(5, H.shape[1]))
    dec_x = QaryDecoder(H, b, max_iter=4, backend="xla")
    dec_p = QaryDecoder(H, b, max_iter=4, backend="pallas")
    hx = np.asarray(dec_x.min_sum(probs.astype(np.float32)))
    with pltpu.force_tpu_interpret_mode():
        hp = np.asarray(dec_p.min_sum(probs.astype(np.float32)))
    assert (hx == hp).all()


def test_qary_special_pallas_backend_matches_xla():
    from jax.experimental.pallas import tpu as pltpu

    from sca_ldpc_tpu.models.kyber import gen_ldpc_matrix
    from sca_ldpc_tpu.ops import QarySpecialDecoder

    H = gen_ldpc_matrix(6, 0, check_blocks=1)
    rng = np.random.RandomState(11)
    q, qs = 5, 25
    ch_b = rng.dirichlet(np.ones(q), size=(3, 768)).astype(np.float32)
    ch_s = rng.dirichlet(np.ones(qs), size=(3, 256)).astype(np.float32)
    dx = QarySpecialDecoder(H, 2, 12, max_iter=3, backend="xla")
    dp = QarySpecialDecoder(H, 2, 12, max_iter=3, backend="pallas")
    hx = np.asarray(dx.min_sum(ch_b, ch_s))
    with pltpu.force_tpu_interpret_mode():
        hp = np.asarray(dp.min_sum(ch_b, ch_s))
    assert (hx == hp).all()


def test_qary_fused_backend_matches_xla():
    """Fully-fused decode (backend='fused'): hard decisions equal the XLA
    path on signed-QC and regular-identity geometries."""
    from jax.experimental.pallas import tpu as pltpu

    from sca_ldpc_tpu.codes import (
        make_qary_qc_parity_check_matrix,
        make_regular_ldpc_parity_check_matrix_identity,
    )
    from sca_ldpc_tpu.ops import QaryDecoder
    from sca_ldpc_tpu.utils import make_random_state

    rng = make_random_state(3)
    H = make_qary_qc_parity_check_matrix(30, 4, 2, rng)
    probs = np.random.RandomState(7).dirichlet(
        np.ones(5), size=(5, H.shape[1])
    ).astype(np.float32)
    hx = np.asarray(QaryDecoder(H, 2, max_iter=4).min_sum(probs))
    with pltpu.force_tpu_interpret_mode():
        hf = np.asarray(QaryDecoder(H, 2, max_iter=4, backend="fused").min_sum(probs))
    assert (hx == hf).all()

    rng = make_random_state(1)
    H2 = make_regular_ldpc_parity_check_matrix_identity(60, 30, 3, 6, rng).astype(np.int8)
    probs2 = np.random.RandomState(9).dirichlet(
        np.ones(15), size=(4, H2.shape[1])
    ).astype(np.float32)
    hx2 = np.asarray(QaryDecoder(H2, 7, max_iter=3).min_sum(probs2))
    with pltpu.force_tpu_interpret_mode():
        hf2 = np.asarray(
            QaryDecoder(H2, 7, max_iter=3, backend="fused").min_sum(probs2)
        )
    assert (hx2 == hf2).all()


def test_qary_special_fused_backend_matches_xla():
    from jax.experimental.pallas import tpu as pltpu

    from sca_ldpc_tpu.models.kyber import gen_ldpc_matrix
    from sca_ldpc_tpu.ops import QarySpecialDecoder

    H = gen_ldpc_matrix(6, 0, check_blocks=1)
    rng = np.random.RandomState(11)
    ch_b = rng.dirichlet(np.ones(5), size=(3, 768)).astype(np.float32)
    ch_s = rng.dirichlet(np.ones(25), size=(3, 256)).astype(np.float32)
    hx = np.asarray(QarySpecialDecoder(H, 2, 12, max_iter=3).min_sum(ch_b, ch_s))
    with pltpu.force_tpu_interpret_mode():
        hf = np.asarray(
            QarySpecialDecoder(H, 2, 12, max_iter=3, backend="fused").min_sum(
                ch_b, ch_s
            )
        )
    assert (hx == hf).all()
