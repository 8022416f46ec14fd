"""Min-plus (tropical) convolution primitives for q-ary check-node updates.

The reference's q-ary check update enumerates every zero-sum configuration of
symbol values along a check and takes a running min (decoder.rs:281-401,
585-631; decoder_special.rs:226-275, 506-554) — up to ``(2B+1)^(DC-1)``
configurations per check.  The identical quantity is computed here as a chain
of min-plus convolutions:

    beta_j[d] = min over {d_l} with sum_l d_l = 0 and d_j = d
                of sum_{l != j} alpha_l[d_l]
              = (minplus-conv of all alpha_l, l != j) evaluated at -d

which costs ``O(DC * W * Q)`` per check with the prefix/suffix trick, fully
vectorized over checks and frames.  Infinite LLRs are carried as a large
finite constant so min-plus arithmetic never produces NaNs (Rust f32 inf-inf
would; the reference sidesteps it by skipping infinite entries).
"""

import jax.numpy as jnp

# "Infinity" for min-plus arithmetic.  Large enough to dominate any real LLR
# sum, small enough that summing DC of them stays far below float32 max.
BIG = 1e15


def clip_inf(x):
    """Replace +inf by the min-plus BIG constant (and clip above it)."""
    return jnp.minimum(jnp.nan_to_num(x, posinf=BIG), BIG)


def identity(width, like=None, dtype=jnp.float32):
    """The min-plus convolution identity: delta at the center symbol 0."""
    s = width // 2
    v = jnp.full((width,), BIG, dtype=dtype)
    v = v.at[s].set(0.0)
    if like is not None:
        v = jnp.broadcast_to(v, like.shape[:-1] + (width,))
    return v


def conv(a, b, s_out, a_half_support=None):
    """Centered min-plus convolution.

    ``a``: [..., 2*Sa+1] supported on symbols [-Sa..Sa]; ``b``: [..., 2*Sb+1];
    output: [..., 2*s_out+1] with ``out[k] = min_i a[i] + b[(k - s_out) - (i - Sa) + Sb]``
    (terms whose b-index falls outside b's support contribute BIG).

    The loop runs over ``a``'s width, so pass the narrower operand first.
    ``a_half_support`` restricts the loop to symbols [-h..h] of ``a`` when the
    caller knows the rest is BIG (prefix/suffix chains have growing support).
    """
    wa = a.shape[-1]
    wb = b.shape[-1]
    sa, sb = (wa - 1) // 2, (wb - 1) // 2
    w_out = 2 * s_out + 1
    off = sa + sb - s_out
    pad = max(0, sa + s_out - sb)
    b_pad = jnp.pad(b, [(0, 0)] * (b.ndim - 1) + [(pad, pad)], constant_values=BIG)

    if a_half_support is None:
        lo, hi = 0, wa
    else:
        h = min(int(a_half_support), sa)
        lo, hi = sa - h, sa + h + 1
    out = None
    for i in range(lo, hi):
        start = off - i + pad
        term = a[..., i : i + 1] + b_pad[..., start : start + w_out]
        out = term if out is None else jnp.minimum(out, term)
    return jnp.minimum(out, BIG)


def chain_exclusive(alphas, s_mid, extra=None):
    """For a stack of operands along an axis, the min-plus conv of all-but-one.

    ``alphas``: [..., D, Q] (D operands of width Q each).  Returns
    ``ext``: [..., D, 2*s_mid+1] where ``ext[..., j, :]`` is the conv of all
    operands except j (optionally also convolved with ``extra`` [..., We]).
    ``s_mid`` must cover the support of any (D-1)-operand partial conv
    (plus extra's support if given).

    Prefix/suffix partial convs have support +-(count * B): the exclusive
    combine loops only that window instead of the full padded width.
    """
    d = alphas.shape[-2]
    q = alphas.shape[-1]
    b_sup = (q - 1) // 2
    w_mid = 2 * s_mid + 1

    prefix = [identity(w_mid, like=alphas[..., 0, :])]
    for j in range(d - 1):
        prefix.append(conv(alphas[..., j, :], prefix[-1], s_mid))
    suffix = [identity(w_mid, like=alphas[..., 0, :])]
    for j in range(d - 1, 0, -1):
        suffix.append(conv(alphas[..., j, :], suffix[-1], s_mid))
    suffix = suffix[::-1]

    outs = []
    for j in range(d):
        # prefix[j] combines j operands -> support +-(j * b_sup)
        e = conv_pair(prefix[j], suffix[j], s_mid, a_half_support=j * b_sup)
        if extra is not None:
            e = conv(extra, e, s_mid) if extra.shape[-1] <= w_mid else conv(e, extra, s_mid)
        outs.append(e)
    return jnp.stack(outs, axis=-2)


def conv_pair(a, b, s_out, a_half_support=None):
    """Min-plus conv of two same-width operands (loops over the first)."""
    return conv(a, b, s_out, a_half_support=a_half_support)
