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
