#!/usr/bin/env python
"""North-star benchmark: decoded frames/s/chip on the HQC-128 parity-check
code at matched FER (BASELINE.md).

Workload: syndrome BP decode of the HQC-128 attack code
[circulant(N=17669, weight=20) | I_N] (35,338 columns), product-sum, up to 30
iterations with per-frame early termination, error rate 0.01 — the hot loop
of both the FER simulations (decode.py:130-177) and the attack's periodic
decode (hqc.py:661-759).

Baseline: the reference's decoder is the ldpc PyPI package's C bp_decoder
driven one frame per Python call (not installed here; its per-frame
edge-sweep structure is reproduced as a vectorized NumPy reference decoder,
which is generous to it).  TPU path: batched rolled-plane circulant decoder.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def build_code(seed=0, n=17669, weight=20):
    from sca_ldpc_tpu.codes.layout import CirculantLayout
    from sca_ldpc_tpu.codes.make_code import random_circulant_first_row
    from sca_ldpc_tpu.utils import make_random_state

    first_row = random_circulant_first_row(n, weight, make_random_state(seed))
    return CirculantLayout.from_first_row(first_row, with_identity=True)


# ---------------------------------------------------------------------------
# CPU reference: per-frame product-sum BP with the same schedule/early exit
# ---------------------------------------------------------------------------


def cpu_reference_decode(lay, prior_llr, syndrome, max_iter=30):
    """One frame, NumPy product-sum syndrome BP on the circulant layout."""
    n = lay.n
    w = lay.weight
    shifts = np.asarray(lay.shifts)
    pc = prior_llr[:n]
    pi = prior_llr[n:]
    v2c = np.stack([np.roll(pc, k) for k in shifts])  # [w, n] check-major
    sgn_syn = 1.0 - 2.0 * syndrome

    def phi(x):
        x = np.clip(x, 1e-9, 60.0)
        return -np.log(np.tanh(0.5 * x))

    e_c = (pc < 0).astype(int)
    e_i = (pi < 0).astype(int)
    it = -1
    for it in range(max_iter):
        planes = np.concatenate([v2c, pi[None, :]], axis=0)  # [w+1, n]
        sgn = np.where(planes >= 0, 1.0, -1.0)
        mag = np.abs(planes)
        total_sign = sgn.prod(axis=0) * sgn_syn
        pm = phi(mag)
        total_pm = pm.sum(axis=0)
        c2v = (total_sign * sgn) * phi(np.maximum(total_pm - pm, 1e-9))
        c2v_c, c2v_i = c2v[:w], c2v[w]
        c2v_var = np.stack([np.roll(c2v_c[t], -k) for t, k in enumerate(shifts)])
        total_c = pc + c2v_var.sum(axis=0)
        v2c_var = np.clip(total_c[None, :] - c2v_var, -60, 60)
        v2c = np.stack([np.roll(v2c_var[t], k) for t, k in enumerate(shifts)])
        total_i = pi + c2v_i
        e_c = (total_c < 0).astype(int)
        e_i = (total_i < 0).astype(int)
        syn = (sum(np.roll(e_c, k) for k in shifts) + e_i) % 2
        if (syn == syndrome).all():
            break
    return np.concatenate([e_c, e_i]), it + 1


def bench_cpu(lay, probs, error_rate, frames=4, max_iter=30, seed=0):
    """Per-frame CPU reference rate.  The rate is taken from the FASTEST
    frame (least host contention) — the measurement most generous to the
    baseline."""
    rng = np.random.RandomState(seed)
    n_vars = lay.n_vars
    prior = np.log((1 - probs) / probs).astype(np.float64)
    ok = 0
    best = float("inf")
    for _ in range(frames):
        e = (rng.rand(n_vars) < error_rate).astype(int)
        syn = (sum(np.roll(e[: lay.n], k) for k in lay.shifts) + e[lay.n :]) % 2
        t0 = time.time()
        e_hat, _iters = cpu_reference_decode(lay, prior, syn, max_iter)
        best = min(best, time.time() - t0)
        ok += int((e_hat == e).all())
    return 1.0 / best, ok / frames


# ---------------------------------------------------------------------------
# TPU path
# ---------------------------------------------------------------------------


def bench_tpu(lay, probs, batch=4096, steps=20, max_iter=30,
              method="product_sum", tb=8, compact=False, backend="pallas",
              lean_group=None, lean_bf16=False, lean_static=False):
    """Fused Pallas decode, measured as `steps` full simulation steps
    (sample -> syndrome -> decode -> compare) inside ONE jitted dispatch —
    per-dispatch latency through the TPU tunnel otherwise dominates.
    ``backend="xla"`` uses the rolled-plane XLA decoder instead (the HBM-
    resident path; the only option where the Pallas kernel exceeds VMEM)."""
    import jax
    import jax.numpy as jnp

    from sca_ldpc_tpu.ops.circulant_bp import _circulant_bp
    from sca_ldpc_tpu.ops.kernels.circulant_pallas import (
        circulant_fer_pallas,
        circulant_fer_pallas_lean,
    )

    n = lay.n
    probs_j = jnp.asarray(probs)
    err = float(np.asarray(probs).ravel()[0])
    prior = float(np.log((1 - err) / err))
    shifts = lay.shifts

    def one_step(key):
        e = jax.random.bernoulli(key, probs_j[None, :], (batch, 2 * n)).astype(jnp.int8)
        if backend == "lean_static":
            ok, _conv = circulant_fer_pallas_lean(
                e, np.asarray(shifts), len(shifts), err, max_iter, tb=tb,
                static_shifts=tuple(int(k) for k in shifts),
            )
        elif backend == "xla":
            e_f = e.astype(jnp.float32)
            syn = e_f[:, n:]
            for k in shifts:
                syn = syn + jnp.roll(e_f[:, :n], k, axis=-1)
            syn = (syn % 2).astype(jnp.int32)
            pc = jnp.full((batch, n), prior, jnp.float32)
            e_hat, _conv, _ = _circulant_bp(pc, pc, syn, shifts, True,
                                            max_iter, method)
            ok = jnp.all(e_hat == e, axis=-1)
        elif backend == "lean":
            ok, _conv = circulant_fer_pallas_lean(
                e, np.asarray(shifts), len(shifts), err, max_iter, tb=tb,
                group=lean_group, bf16_rolls=lean_bf16,
                static_shifts=tuple(int(k) for k in shifts) if lean_static
                else None,
            )
        else:
            ok, _conv = circulant_fer_pallas(e, shifts, err, max_iter, tb=tb,
                                             method=method, compact=compact)
        return jnp.sum(ok)

    @jax.jit
    def multi(key):
        return jax.lax.fori_loop(
            0, steps, lambda i, a: a + one_step(jax.random.fold_in(key, i)),
            jnp.int32(0),
        )

    out = multi(jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    dt, out = _best_of(lambda i: multi(jax.random.PRNGKey(1)))
    return steps * batch / dt, int(out) / (steps * batch)


def _best_of(run, repeats=3):
    """Time `run(i)` `repeats` times, return (fastest dt, its result).

    Remote co-tenant bursts can stall a single dispatch by orders of
    magnitude (CLAUDE.md); the fastest of a few dispatches is the
    steady-state number."""
    import jax

    best_dt, best_out = float("inf"), None
    for i in range(repeats):
        t0 = time.time()
        out = run(i)
        jax.block_until_ready(out)
        dt = time.time() - t0
        if dt < best_dt:
            best_dt, best_out = dt, out
    return best_dt, best_out


def bench_qary_medium(batch=4096, iters=10, steps=10):
    """Criterion 'medium decoder' equivalent (benches/decoder.rs:66-92):
    N=450 R=150 DV=3 DC=7 B=7 Q=15, 10 iterations — batched, measured as
    `steps` decodes of the batch inside ONE jitted fori_loop dispatch (the
    same per-dispatch-latency-free methodology as bench_tpu)."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from sca_ldpc_tpu.channels.llr import probs_to_llr
    from sca_ldpc_tpu.codes import make_regular_ldpc_parity_check_matrix_identity
    from sca_ldpc_tpu.ops import QaryDecoder
    from sca_ldpc_tpu.ops import minplus
    from sca_ldpc_tpu.utils import make_random_state

    rng = make_random_state(1)
    H = make_regular_ldpc_parity_check_matrix_identity(300, 150, 3, 6, rng).astype(np.int8)
    # Fully-fused Pallas decode (all iterations VMEM-resident, variable
    # update as one-hot MXU matmuls): 2x the split check-update kernel
    # (hard decisions equal; tests/test_pallas_kernel.py).
    dec = QaryDecoder(H, b_range=7, max_iter=iters, backend="fused")
    q = 15
    channel = np.zeros((batch, 450, q), np.float32)
    channel[:, :, 7] = 1.0
    channel[:, 1, 7] = 0.1
    channel[:, 1, 14] = 0.9
    llr = jax.device_put(
        np.asarray(minplus.clip_inf(probs_to_llr(jnp.asarray(channel))))
    )

    @partial(jax.jit, static_argnames=("steps",))
    def loop(llr, steps):
        def body(i, acc):
            x = llr.at[:, 0, 0].add(1e-6 * i)  # defeat loop-invariant hoisting
            hard = dec._decode_llr(x)
            return acc + jnp.sum(jnp.abs(hard))
        return jax.lax.fori_loop(0, steps, body, jnp.int32(0))

    out = loop(llr, steps)
    jax.block_until_ready(out)
    dt, out = _best_of(lambda i: loop(llr, steps))
    ok = int(out) == 0  # all-zero codeword recovered in every step
    return steps * batch / dt, ok


def bench_kyber_decoder(batch=4096, iters=10, steps=10):
    """Kyber-768 production decoder (DecoderN1280R512SW6 equivalent,
    lib.rs:65-75) — batched two-alphabet min-sum, in-dispatch loop timing."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from sca_ldpc_tpu.channels.llr import probs_to_llr
    from sca_ldpc_tpu.models.kyber import gen_ldpc_matrix, get_decoder
    from sca_ldpc_tpu.ops import minplus
    from sca_ldpc_tpu.ops.kernels.qary_pallas import qary_special_min_sum_fused
    from sca_ldpc_tpu.ops.qary import _signed

    H = gen_ldpc_matrix(6, 0, check_blocks=2)
    # Fully-fused two-alphabet decode (hard decisions equal the XLA path;
    # tests/test_pallas_kernel.py).
    dec = get_decoder(6, H, 2, iterations=iters, backend="fused")
    n_b, r = 768, 512
    ch_b = np.full((batch, n_b, 5), 0.02, np.float32)
    ch_b[:, :, 2] = 0.92
    ch_s = np.zeros((batch, r, 25), np.float32)
    ch_s[:, :, 12] = 1.0
    llr_b = jnp.asarray(minplus.clip_inf(probs_to_llr(jnp.asarray(ch_b))))
    llr_s = jnp.asarray(minplus.clip_inf(probs_to_llr(jnp.asarray(ch_s))))
    llr_s_row = jnp.take(llr_s, jnp.asarray(dec._sum_var), axis=1)
    fargs = dec._fused_args()
    vsum = _signed(llr_s_row, jnp.asarray(dec._args[6], jnp.int32)[None, :])

    @partial(jax.jit, static_argnames=("steps",))
    def loop(llr_b, llr_s_row, vsum, steps):
        def body(i, acc):
            x = llr_b.at[:, 0, 0].add(1e-6 * i)
            hb, hs = qary_special_min_sum_fused(
                x, llr_s_row, vsum, *fargs, dec.b, dec.bsum, dec.max_iter
            )
            return acc + jnp.sum(jnp.abs(hb)) + jnp.sum(jnp.abs(hs))
        return jax.lax.fori_loop(0, steps, body, jnp.int32(0))

    out = loop(llr_b, llr_s_row, vsum, steps)
    jax.block_until_ready(out)
    dt, out = _best_of(lambda i: loop(llr_b, llr_s_row, vsum, steps))
    ok = int(out) == 0
    return steps * batch / dt, ok


def bench_param_sets(max_iter=30, steps=10):
    """Pallas frames/s for all three HQC parameter-set attack codes
    (hqc.py:1009-1034: N=17669/35851/57637, attack weights 20/30/30).

    VMEM feasibility (all MEASURED compile outcomes, not estimates):
    - full-cache kernel, w=30/tb=8, N=35,851: 144.3 MB > 128 MB — OOM
      (2x [w,tb,n] f32 caches + bf16 messages + 55 MB register spills).
    - compact variant (no phi cache, bf16 extrinsics;
      circulant_pallas._make_kernel): fits HQC-192 at tb=8.
    - compact at N=57,637: 158.1 MB > 128 MB — OOM, and 94.6 MB of it is
      register-allocator spill slots from the w=30 unrolled plane loops,
      so no further scratch dieting closes the gap (tb<8 is rejected by
      the Pallas sublane-divisibility rule).  HQC-256 therefore runs the
      loop-rolled **lean** kernel — VMEM-resident where the unrolled
      forms cannot be — in its round-3 **lean_static** form (shifts
      compiled in, static lane-shuffle rolls on the raw unaligned axis):
      12,889 frames/s vs 5,667 for the shifts-as-data dynamic-rotate
      form and 1,980 for the rolled-plane XLA fallback (backend="xla",
      batch<=256 — its [B, W, N] HBM planes OOM at batch 1024).  The
      dynamic form remains the default for bench/FER work on fresh
      random circulants (one compile per weight instead of per
      circulant; the attack's circulant decode uses the XLA rolled-plane
      path in ops/circulant_bp.py, not this kernel).
    Batch is scaled down with N to bound HBM and compile time.
    """
    rows = []
    for name, n, weight, batch, tb, compact, backend in (
        ("hqc128", 17669, 20, 4096, 8, False, "pallas"),
        ("hqc192", 35851, 30, 2048, 8, True, "pallas"),
        ("hqc256", 57637, 30, 2048, 8, True, "lean_static"),
    ):
        lay = build_code(seed=0, n=n, weight=weight)
        probs = np.full(lay.n_vars, 0.01, np.float32)
        t0 = time.time()
        fps, success = bench_tpu(lay, probs, batch=batch, steps=steps,
                                 max_iter=max_iter, tb=tb, compact=compact,
                                 backend=backend)
        rows.append((name, n, weight, batch, fps, success, time.time() - t0))
        print(f"# {name}: N={n} w={weight} batch={batch} tb={tb} "
              f"compact={compact} backend={backend} -> {fps:.1f} "
              f"frames/s/chip, success {success:.4f} "
              f"[{rows[-1][6]:.0f}s incl. compile]", file=sys.stderr)
    return rows


def main():
    from sca_ldpc_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    full = "--full" in sys.argv
    if "--param-sets" in sys.argv:
        rows = bench_param_sets()
        h256 = next(r for r in rows if r[0] == "hqc256")
        # one JSON line always (CLAUDE.md invariant); baseline = the XLA
        # rolled-plane fallback's measured 1,980 frames/s at HQC-256
        print(json.dumps({
            "metric": "hqc256_parity_check_decode_frames_per_s_per_chip",
            "value": round(h256[4], 1),
            "unit": "frames/s/chip (N=115274 cols, product-sum BP to "
                    "convergence, err 0.01)",
            "vs_baseline": round(h256[4] / 1980.0, 2),
        }))
        return
    error_rate = 0.01
    max_iter = 30
    lay = build_code()
    probs = np.full(lay.n_vars, error_rate, np.float32)

    cpu_fps, cpu_success = bench_cpu(lay, probs, error_rate, frames=3, max_iter=max_iter)
    print(f"# cpu reference: {cpu_fps:.2f} frames/s, success {cpu_success:.3f}",
          file=sys.stderr)

    tpu_fps, tpu_success = bench_tpu(lay, probs, batch=4096, steps=20,
                                     max_iter=max_iter)
    print(f"# tpu: {tpu_fps:.1f} frames/s/chip, success {tpu_success:.4f}",
          file=sys.stderr)

    if full:
        qfps, qok = bench_qary_medium()
        print(f"# qary medium decoder (N450 R150 B7 Q15, 10 iters): "
              f"{qfps:.1f} decodes/s, correct={qok}", file=sys.stderr)
        kfps, kok = bench_kyber_decoder()
        print(f"# kyber-768 decoder (N1280 R512 SW6, 10 iters): "
              f"{kfps:.1f} decodes/s, correct={kok}", file=sys.stderr)

    print(json.dumps({
        "metric": "hqc128_parity_check_decode_frames_per_s_per_chip",
        "value": round(tpu_fps, 1),
        "unit": "frames/s/chip (N=35338 cols, product-sum BP to convergence, err 0.01)",
        "vs_baseline": round(tpu_fps / cpu_fps, 1),
    }))


if __name__ == "__main__":
    main()
