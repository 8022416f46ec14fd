"""Fused Pallas TPU kernel for the q-ary check-node update.

The check update is the dominant cost of q-ary min-sum decoding
(~2/3 of the iteration): a prefix/suffix chain of min-plus convolutions
per check (ops/minplus.py, mirroring decoder.rs:585-631's zero-sum
configuration min).  In the XLA path every partial conv round-trips HBM;
this kernel keeps the whole chain of one frame tile in VMEM.

Layout: messages arrive as ``[DC, Q, Bt, R]`` (symbol axis on sublanes, checks
on lanes) so every convolution step is a static sublane slice plus a
broadcast row — no gathers, no dynamic indexing.  The term order of every
min/add matches :func:`sca_ldpc_tpu.ops.minplus.chain_exclusive` exactly, so
the kernel output is bitwise identical to the XLA path
(tests/test_pallas_kernel.py enforces this in interpreter mode).

The same kernel family serves the two-alphabet special decoder
(decoder_special.rs semantics) via the optional ``extra`` operand — the
degree-1 sum-variable message convolved into every exclusive output.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..minplus import BIG


def _conv_planes(a, b, s_out, ha=None, hb=None):
    """Min-plus conv of ``a`` [Wa, TB, R] and ``b`` [Wb, TB, R] along axis 0,
    output [2*s_out+1, TB, R].  Same term order as minplus.conv."""
    sa = (a.shape[0] - 1) // 2
    sb = (b.shape[0] - 1) // 2
    ha = sa if ha is None else min(int(ha), sa)
    hb = sb if hb is None else min(int(hb), sb)
    if hb < ha:
        a, b = b, a
        sa, sb = sb, sa
        ha, hb = hb, ha

    w_out = 2 * s_out + 1
    off = sa + sb - s_out
    pad = max(0, sa + s_out - sb)
    if pad:
        big = jnp.full((pad,) + b.shape[1:], BIG, b.dtype)
        b = jnp.concatenate([big, b, big], axis=0)

    out = None
    for i in range(sa - ha, sa + ha + 1):
        start = off - i + pad
        term = a[i : i + 1] + b[start : start + w_out]
        out = term if out is None else jnp.minimum(out, term)
    return jnp.minimum(out, BIG)


def _make_check_kernel(dc, q, b_sup, s_mid, s_out, se, has_extra):
    """Kernel computing chain_exclusive(v2c, s_mid, extra, s_out) for one
    frame tile.  ``se``: extra operand half-support (may be 0 even when an
    extra operand is present — a width-1 extra is a per-edge constant)."""
    d = dc
    s_pre = s_out + se

    def cap(count):
        return min(count * b_sup, s_pre + (d - 1 - count) * b_sup, s_mid)

    def body(refs):
        if has_extra:
            v2c_ref, extra_ref, out_ref = refs
        else:
            v2c_ref, out_ref = refs
        x = v2c_ref[...]  # [DC, Q, TB, R]
        ident = jnp.zeros((1,) + x.shape[2:], x.dtype)

        prefix = [ident]
        for j in range(d - 1):
            prefix.append(
                _conv_planes(x[j], prefix[-1], cap(j + 1), hb=j * b_sup)
            )
        suffix = [ident]
        for j in range(d - 1, 0, -1):
            count = d - j
            suffix.append(
                _conv_planes(x[j], suffix[-1], cap(count), hb=(count - 1) * b_sup)
            )
        suffix = suffix[::-1]

        extra = extra_ref[...] if has_extra else None  # [2*se+1, TB, R]
        for j in range(d):
            e = _conv_planes(
                prefix[j], suffix[j], s_pre, ha=j * b_sup, hb=(d - 1 - j) * b_sup
            )
            if has_extra:
                e = _conv_planes(extra, e, s_out, ha=se, hb=s_pre)
            out_ref[j] = e

    if has_extra:
        return lambda v2c_ref, extra_ref, out_ref: body((v2c_ref, extra_ref, out_ref))
    return lambda v2c_ref, out_ref: body((v2c_ref, out_ref))


@partial(jax.jit, static_argnames=("s_mid", "s_out", "tb"))
def chain_exclusive_pallas(v2c, s_mid: int, s_out: int, extra=None, tb: int = 8):
    """Drop-in for ``minplus.chain_exclusive(v2c, s_mid, extra, s_out)``.

    ``v2c``: [Bt, R, DC, Q]; ``extra``: [Bt, R, We] or None.
    Returns [Bt, R, DC, 2*s_out+1] (bitwise equal to the XLA path).
    Batches not divisible by ``tb`` are zero-padded for the kernel call.
    """
    bt0 = v2c.shape[0]
    if bt0 % tb:
        pad_bt = tb - bt0 % tb
        v2c = jnp.concatenate(
            [v2c, jnp.zeros((pad_bt,) + v2c.shape[1:], v2c.dtype)], axis=0
        )
        if extra is not None:
            extra = jnp.concatenate(
                [extra, jnp.zeros((pad_bt,) + extra.shape[1:], extra.dtype)], axis=0
            )
        return chain_exclusive_pallas(v2c, s_mid, s_out, extra=extra, tb=tb)[:bt0]
    bt, r, dc, q = v2c.shape
    b_sup = (q - 1) // 2
    has_extra = extra is not None
    se = 0 if extra is None else (extra.shape[-1] - 1) // 2
    w_out = 2 * s_out + 1
    grid = (bt // tb,)

    x = jnp.transpose(v2c, (2, 3, 0, 1))  # [DC, Q, Bt, R]
    in_specs = [
        pl.BlockSpec((dc, q, tb, r), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM)
    ]
    args = [x]
    if has_extra:
        xe = jnp.transpose(extra, (2, 0, 1))  # [We, Bt, R]
        in_specs.append(
            pl.BlockSpec(
                (2 * se + 1, tb, r), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            )
        )
        args.append(xe)

    kernel = _make_check_kernel(dc, q, b_sup, s_mid, s_out, se, has_extra)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (dc, w_out, tb, r), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((dc, w_out, bt, r), v2c.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(*args)
    return jnp.transpose(out, (2, 3, 0, 1))  # [Bt, R, DC, w_out]


# ---------------------------------------------------------------------------
# Fully-fused q-ary decode: ALL iterations of check + variable update inside
# one kernel.  Message state stays in VMEM for the whole decode; the
# variable-side gather/scatter becomes per-slot one-hot matmuls on the MXU
# (graph adjacency as data), so HBM sees channel LLRs in and hard decisions
# out, independent of iteration count.
# ---------------------------------------------------------------------------


def _flip_q(x):
    """Reverse axis 0 (the symbol axis) of [Q, ...] via unrolled concat."""
    qn = x.shape[0]
    return jnp.concatenate([x[i : i + 1] for i in range(qn - 1, -1, -1)], axis=0)


def _make_fused_kernel(n, r, dc, q, b_sup, max_iter, tb):
    s_mid = (dc - 1) * b_sup

    def kernel(ch_ref, gt_ref, gv_ref, neg_ref, pad_ref, hard_ref, v2c, tot):
        # ch: [Q, TB, N]; gt: [DC, N, R]; gv: [DC, R, N];
        # neg/pad: [DC, 1, R] f32 0/1; hard: [TB, N] int32
        # scratch: v2c [DC, Q, TB, R], tot [Q, TB, N]
        ch = ch_ref[...]
        qi = jax.lax.broadcasted_iota(jnp.int32, (q, 1, 1), 0)
        delta = jnp.where(qi == b_sup, 0.0, BIG)  # [Q, 1, 1]

        def signed(x, neg):  # x [Q, TB, R], neg [1, R] broadcastable
            return neg * _flip_q(x) + (1.0 - neg) * x

        def gather(total):  # [Q, TB, N] -> list of DC [Q, TB, R] signed planes
            flat = total.reshape(q * tb, n)
            outs = []
            for d in range(dc):
                a = jnp.dot(flat, gt_ref[d], preferred_element_type=jnp.float32)
                a = a.reshape(q, tb, r)
                a = signed(a, neg_ref[d])
                outs.append(a)
            return outs

        # initial v2c = signed channel at each edge (delta on pad slots)
        for d, a in enumerate(gather(ch)):
            v2c[d] = pad_ref[d] * delta + (1.0 - pad_ref[d]) * a

        def iteration(_i, carry):
            # ---- check update: exclusive min-plus chain per dc slot.
            x = v2c[...]  # [DC, Q, TB, R]
            ident = jnp.zeros((1, tb, r), jnp.float32)
            prefix = [ident]
            for j in range(dc - 1):
                cap = min((j + 1) * b_sup, b_sup + (dc - 2 - j) * b_sup, s_mid)
                prefix.append(_conv_planes(x[j], prefix[-1], cap, hb=j * b_sup))
            suffix = [ident]
            for j in range(dc - 1, 0, -1):
                count = dc - j
                cap = min(count * b_sup, b_sup + (dc - 1 - count) * b_sup, s_mid)
                suffix.append(
                    _conv_planes(x[j], suffix[-1], cap, hb=(count - 1) * b_sup)
                )
            suffix = suffix[::-1]

            # ---- variable update: u = unsigned c2v; totals via scatter
            # matmuls; extrinsic check-side via gather matmuls.
            us = []
            for d in range(dc):
                ext = _conv_planes(
                    prefix[d], suffix[d], b_sup,
                    ha=d * b_sup, hb=(dc - 1 - d) * b_sup,
                )
                c2v_d = jnp.minimum(_flip_q(ext), BIG)  # signed (edge) domain
                c2v_d = pad_ref[d] * delta + (1.0 - pad_ref[d]) * c2v_d
                v2c[d] = c2v_d  # reuse scratch: stash c2v until extrinsic
                u = signed(c2v_d, neg_ref[d])  # unsigned (variable) domain
                u = (1.0 - pad_ref[d]) * u  # pad slots contribute 0
                us.append(u)

            total = ch
            for d in range(dc):
                contrib = jnp.dot(
                    us[d].reshape(q * tb, r), gv_ref[d],
                    preferred_element_type=jnp.float32,
                ).reshape(q, tb, n)
                total = total + contrib
            tot[...] = total

            for d, a in enumerate(gather(total)):
                prim = a - v2c[d]  # v2c currently holds c2v (signed)
                prim = prim - jnp.min(prim, axis=0, keepdims=True)
                prim = jnp.minimum(prim, BIG)
                v2c[d] = pad_ref[d] * delta + (1.0 - pad_ref[d]) * prim
            return carry

        jax.lax.fori_loop(0, max_iter, iteration, jnp.int32(0))

        # hard decision: first-minimal symbol index (argmin semantics).
        total = tot[...]
        best = total[0]
        besti = jnp.zeros((tb, n), jnp.int32)
        for qq in range(1, q):
            m = total[qq] < best
            besti = jnp.where(m, qq, besti)
            best = jnp.where(m, total[qq], best)
        hard_ref[...] = besti - b_sup

    return kernel


@partial(jax.jit, static_argnames=("b_sup", "max_iter", "tb"))
def qary_min_sum_fused(channel_llr, gt, gv, neg, pad, b_sup: int,
                       max_iter: int, tb: int = 8):
    """Fused full decode.  ``channel_llr``: [Bt, N, Q] finite min-sum LLRs;
    ``gt``: [DC, N, R] one-hot gather (var -> edge slot); ``gv``: [DC, R, N]
    transpose; ``neg``/``pad``: [DC, 1, R] 0/1 masks.  Returns hard [Bt, N]."""
    bt0 = channel_llr.shape[0]
    if bt0 % tb:
        pad_bt = tb - bt0 % tb
        channel_llr = jnp.concatenate(
            [channel_llr,
             jnp.zeros((pad_bt,) + channel_llr.shape[1:], channel_llr.dtype)],
            axis=0,
        )
        return qary_min_sum_fused(
            channel_llr, gt, gv, neg, pad, b_sup, max_iter, tb
        )[:bt0]
    bt, n, q = channel_llr.shape
    dc, _, r = gt.shape
    ch = jnp.transpose(channel_llr, (2, 0, 1))  # [Q, Bt, N]

    kernel = _make_fused_kernel(n, r, dc, q, b_sup, max_iter, tb)
    hard = pl.pallas_call(
        kernel,
        grid=(bt // tb,),
        in_specs=[
            pl.BlockSpec((q, tb, n), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dc, n, r), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dc, r, n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dc, 1, r), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dc, 1, r), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bt, n), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((dc, q, tb, r), jnp.float32),
            pltpu.VMEM((q, tb, n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(ch, gt, gv, neg, pad)
    return hard


# ---------------------------------------------------------------------------
# Fused two-alphabet decode (decoder_special.rs semantics): B-variable
# messages iterate in VMEM; the degree-1 sum variables enter the check
# update as a constant extra operand and get their totals from the full
# in-check convolution.
# ---------------------------------------------------------------------------


def _make_fused_special_kernel(n_b, r, sw, qb, qs, b_sup, bsum, max_iter, tb):
    s_mid = (2 * sw - 1) * b_sup
    s_pre = b_sup + bsum  # combine-stage support before the extra conv

    def cap(count):
        return min(count * b_sup, s_pre + (sw - 1 - count) * b_sup, s_mid)

    def kernel(ch_ref, chs_ref, vsum_ref, gt_ref, gv_ref, neg_ref, pad_ref,
               sneg_ref, hardb_ref, hards_ref, v2c, totb, tots):
        # ch: [QB, TB, NB]; chs: [QS, TB, R] (unsigned sum channel, row order)
        # vsum: [QS, TB, R] (signed = the constant sum-var v2c message)
        # gt: [SW, NB, R]; gv: [SW, R, NB]; neg/pad: [SW, 1, R]; sneg: [1, 1, R]
        ch = ch_ref[...]
        vsum = vsum_ref[...]
        qi = jax.lax.broadcasted_iota(jnp.int32, (qb, 1, 1), 0)
        delta = jnp.where(qi == b_sup, 0.0, BIG)

        def signed(x, neg):
            return neg * _flip_q(x) + (1.0 - neg) * x

        def gather(total):
            flat = total.reshape(qb * tb, n_b)
            outs = []
            for d in range(sw):
                a = jnp.dot(flat, gt_ref[d], preferred_element_type=jnp.float32)
                a = signed(a.reshape(qb, tb, r), neg_ref[d])
                outs.append(a)
            return outs

        for d, a in enumerate(gather(ch)):
            v2c[d] = pad_ref[d] * delta + (1.0 - pad_ref[d]) * a

        def iteration(_i, carry):
            x = v2c[...]  # [SW, QB, TB, R]
            ident = jnp.zeros((1, tb, r), jnp.float32)
            prefix = [ident]
            for j in range(sw - 1):
                prefix.append(_conv_planes(x[j], prefix[-1], cap(j + 1),
                                           hb=j * b_sup))
            suffix = [ident]
            for j in range(sw - 1, 0, -1):
                count = sw - j
                suffix.append(_conv_planes(x[j], suffix[-1], cap(count),
                                           hb=(count - 1) * b_sup))
            suffix = suffix[::-1]

            # sum-variable totals: full conv of ALL SW B-messages, reversed.
            full = jnp.concatenate(
                [jnp.full((bsum, tb, r), BIG), ident,
                 jnp.full((bsum, tb, r), BIG)], axis=0)
            for j in range(sw):
                full = _conv_planes(x[j], full, bsum, hb=j * b_sup)
            c2v_sum = jnp.minimum(_flip_q(full), BIG)
            c2v_sum_u = sneg_ref[0] * _flip_q(c2v_sum) + (1.0 - sneg_ref[0]) * c2v_sum
            tots[...] = chs_ref[...] + c2v_sum_u

            us = []
            for d in range(sw):
                e = _conv_planes(prefix[d], suffix[d], s_pre,
                                 ha=d * b_sup, hb=(sw - 1 - d) * b_sup)
                e = _conv_planes(vsum, e, b_sup, ha=bsum, hb=s_pre)
                c2v_d = jnp.minimum(_flip_q(e), BIG)
                c2v_d = pad_ref[d] * delta + (1.0 - pad_ref[d]) * c2v_d
                v2c[d] = c2v_d
                u = signed(c2v_d, neg_ref[d])
                us.append((1.0 - pad_ref[d]) * u)

            total = ch
            for d in range(sw):
                total = total + jnp.dot(
                    us[d].reshape(qb * tb, r), gv_ref[d],
                    preferred_element_type=jnp.float32,
                ).reshape(qb, tb, n_b)
            totb[...] = total

            for d, a in enumerate(gather(total)):
                prim = a - v2c[d]
                prim = prim - jnp.min(prim, axis=0, keepdims=True)
                prim = jnp.minimum(prim, BIG)
                v2c[d] = pad_ref[d] * delta + (1.0 - pad_ref[d]) * prim
            return carry

        jax.lax.fori_loop(0, max_iter, iteration, jnp.int32(0))

        def argmin0(t, width, off):
            best = t[0]
            besti = jnp.zeros(t.shape[1:], jnp.int32)
            for qq in range(1, width):
                m = t[qq] < best
                besti = jnp.where(m, qq, besti)
                best = jnp.where(m, t[qq], best)
            return besti - off

        hardb_ref[...] = argmin0(totb[...], qb, b_sup)
        hards_ref[...] = argmin0(tots[...], qs, bsum)

    return kernel


@partial(jax.jit, static_argnames=("b_sup", "bsum", "max_iter", "tb"))
def qary_special_min_sum_fused(channel_llr, channel_sum_row, vsum_signed,
                               gt, gv, neg, pad, sneg,
                               b_sup: int, bsum: int, max_iter: int,
                               tb: int = 8):
    """Fused two-alphabet decode.  ``channel_llr``: [Bt, NB, QB];
    ``channel_sum_row``/``vsum_signed``: [Bt, R, QS] (row-ordered unsigned
    channel and its signed form); adjacency as in qary_min_sum_fused plus
    ``sneg`` [1, 1, R].  Returns (hard_b [Bt, NB], hard_sum_row [Bt, R])."""
    bt0 = channel_llr.shape[0]
    if bt0 % tb:
        pad_bt = tb - bt0 % tb
        z = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad_bt,) + a.shape[1:], a.dtype)], axis=0)
        hb, hs = qary_special_min_sum_fused(
            z(channel_llr), z(channel_sum_row), z(vsum_signed),
            gt, gv, neg, pad, sneg, b_sup, bsum, max_iter, tb)
        return hb[:bt0], hs[:bt0]
    bt, n_b, qb = channel_llr.shape
    r = channel_sum_row.shape[1]
    qs = channel_sum_row.shape[2]
    sw = gt.shape[0]

    ch = jnp.transpose(channel_llr, (2, 0, 1))      # [QB, Bt, NB]
    chs = jnp.transpose(channel_sum_row, (2, 0, 1))  # [QS, Bt, R]
    vs = jnp.transpose(vsum_signed, (2, 0, 1))       # [QS, Bt, R]

    kernel = _make_fused_special_kernel(
        n_b, r, sw, qb, qs, b_sup, bsum, max_iter, tb
    )
    hard_b, hard_s = pl.pallas_call(
        kernel,
        grid=(bt // tb,),
        in_specs=[
            pl.BlockSpec((qb, tb, n_b), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qs, tb, r), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qs, tb, r), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((sw, n_b, r), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((sw, r, n_b), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((sw, 1, r), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((sw, 1, r), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, r), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, n_b), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, r), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bt, n_b), jnp.int32),
            jax.ShapeDtypeStruct((bt, r), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((sw, qb, tb, r), jnp.float32),
            pltpu.VMEM((qb, tb, n_b), jnp.float32),
            pltpu.VMEM((qs, tb, r), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(ch, chs, vs, gt, gv, neg, pad, sneg)
    return hard_b, hard_s
