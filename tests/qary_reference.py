"""Slow, exact Python model of the q-ary min-sum decoder semantics
(decoder.rs:560-666) — configuration enumeration and all.  Used by the test
suite as a conformance oracle for the vectorized min-plus implementation."""

import itertools
import math

import numpy as np

INF = math.inf


def into_llr(probs):
    probs = np.asarray(probs, dtype=np.float64)
    out = np.empty_like(probs)
    for idx in np.ndindex(probs.shape[:-1]):
        m = probs[idx].max()
        for q in range(probs.shape[-1]):
            p = probs[idx][q]
            out[idx][q] = INF if p <= 0 else math.log(m / p)
    return out


def mult_in_gf(vec, h):
    return vec[::-1].copy() if h < 0 else vec.copy()


def ref_min_sum(H, b, max_iter, channel_probs, return_trace=False):
    """Exact enumeration-based q-ary min-sum; returns hard decisions."""
    H = np.asarray(H)
    r, n = H.shape
    q = 2 * b + 1
    llr = into_llr(channel_probs)

    chk_nbrs = [list(np.flatnonzero(H[i])) for i in range(r)]
    var_nbrs = [list(np.flatnonzero(H[:, j])) for j in range(n)]

    v2c = {}
    c2v = {}
    for j in range(n):
        for i in var_nbrs[j]:
            v2c[(i, j)] = mult_in_gf(llr[j], H[i, j])

    trace = []
    hard = np.zeros(n, dtype=int)
    for it in range(1, max_iter + 1):
        # check update: enumerate zero-sum configurations over finite support
        for i in range(r):
            nbrs = chk_nbrs[i]
            alpha = [v2c[(i, j)] for j in nbrs]
            finite = [
                [d for d in range(-b, b + 1) if math.isfinite(a[d + b])] for a in alpha
            ]
            beta = [np.full(q, INF) for _ in nbrs]
            for combo in itertools.product(*finite[:-1]):
                dlast = -sum(combo)
                if dlast not in finite[-1]:
                    continue
                config = list(combo) + [dlast]
                s = sum(a[d + b] for a, d in zip(alpha, config))
                if not math.isfinite(s):
                    continue
                for k in range(len(nbrs)):
                    d = config[k]
                    beta[k][d + b] = min(beta[k][d + b], s - alpha[k][d + b])
            for k, j in enumerate(nbrs):
                c2v[(i, j)] = beta[k]

        # variable update
        for j in range(n):
            total = llr[j].copy()
            for i in var_nbrs[j]:
                total = total + mult_in_gf(c2v[(i, j)], H[i, j])
            for i in var_nbrs[j]:
                prim = total - mult_in_gf(c2v[(i, j)], H[i, j])
                prim = mult_in_gf(prim, H[i, j])
                prim = prim - prim.min() if math.isfinite(prim.min()) else prim
                v2c[(i, j)] = prim
            if it >= max_iter:
                hard[j] = int(np.argmin(total)) - b
        if return_trace:
            trace.append({k: v.copy() for k, v in c2v.items()})
    if return_trace:
        return hard, trace
    return hard


def ref_special_min_sum(H, b, bsum, max_iter, channel_probs, channel_probs_sum,
                        clip=None):
    """Exact model of the two-alphabet ``DecoderSpecial::min_sum``
    (decoder_special.rs:471-617) for ``H = [H'|I]``.

    Per check: the full ``(2B+1)^deg`` d-value grid over its B-variable
    neighbors (SimpleDValueIterator, :226-275 — trailing ``num_ignore``
    slots pinned to 0 are equivalent to enumerating only the real
    neighbors), counterweight ``d_sum = -sum(d)`` indexing the sum
    variable's LLR (:533-537), min-updates of both beta classes
    (:539-554), then the standard variable update / normalization for
    both classes (:566-609).  The grid reduction is vectorized with
    numpy (min over the grid is order-independent) but the semantics are
    the iterator's, in float64.

    ``clip``: optional finite cap applied to the input LLRs (pass
    ``minplus.BIG`` to mirror the framework's inf clipping when
    posteriors contain zero-probability symbols; the Rust code keeps
    +inf, which only differs when a whole check row is impossible).
    Returns hard decisions for all N variables (B class then sum class,
    in column order).
    """
    H = np.asarray(H)
    r, n = H.shape
    n_b = n - r
    bsize, bsumsize = 2 * b + 1, 2 * bsum + 1
    llr_b = into_llr(channel_probs)
    llr_s = into_llr(channel_probs_sum)
    if clip is not None:
        llr_b = np.minimum(llr_b, clip)
        llr_s = np.minimum(llr_s, clip)

    chk_b, chk_s = [], []
    for i in range(r):
        nz = np.flatnonzero(H[i])
        bs = [j for j in nz if j < n_b]
        ss = [j for j in nz if j >= n_b]
        assert len(ss) == 1, "each row must have exactly one sum variable"
        chk_b.append(bs)
        chk_s.append(int(ss[0]))
    var_nbrs = [list(np.flatnonzero(H[:, j])) for j in range(n_b)]

    v2c = {
        (i, j): mult_in_gf(llr_b[j], H[i, j])
        for i in range(r)
        for j in chk_b[i]
    }
    v2c_sum = {
        i: mult_in_gf(llr_s[chk_s[i] - n_b], H[i, chk_s[i]]) for i in range(r)
    }

    grid_cache = {}

    def grid(deg):
        if deg not in grid_cache:
            g = np.array(
                list(itertools.product(range(-b, b + 1), repeat=deg)), dtype=int
            )
            grid_cache[deg] = g
        return grid_cache[deg]

    hard = np.zeros(n, dtype=int)
    for it in range(1, max_iter + 1):
        c2v, c2v_sum = {}, {}
        for i in range(r):
            nbrs = chk_b[i]
            deg = len(nbrs)
            g = grid(deg)  # [G, deg] d-values
            alpha = np.stack([v2c[(i, j)] for j in nbrs])  # [deg, bsize]
            a_sum = v2c_sum[i]  # [bsumsize]
            dsum = -g.sum(axis=1)
            a_terms = alpha[np.arange(deg)[None, :], g + b]  # [G, deg]
            s = a_terms.sum(axis=1) + a_sum[dsum + bsum]  # [G]
            beta = np.full((deg, bsize), INF)
            for k in range(deg):
                np.minimum.at(beta[k], g[:, k] + b, s - a_terms[:, k])
            beta_sum = np.full(bsumsize, INF)
            np.minimum.at(beta_sum, dsum + bsum, s - a_sum[dsum + bsum])
            for k, j in enumerate(nbrs):
                c2v[(i, j)] = beta[k]
            c2v_sum[i] = beta_sum

        for j in range(n_b):
            total = llr_b[j].copy()
            for i in var_nbrs[j]:
                total = total + mult_in_gf(c2v[(i, j)], H[i, j])
            for i in var_nbrs[j]:
                prim = total - mult_in_gf(c2v[(i, j)], H[i, j])
                prim = mult_in_gf(prim, H[i, j])
                prim = prim - prim[int(np.argmin(prim))]
                v2c[(i, j)] = prim
            if it >= max_iter:
                hard[j] = int(np.argmin(total)) - b

        for i in range(r):
            jv = chk_s[i]
            h_entry = H[i, jv]
            total = llr_s[jv - n_b] + mult_in_gf(c2v_sum[i], h_entry)
            prim = mult_in_gf(total - mult_in_gf(c2v_sum[i], h_entry), h_entry)
            v2c_sum[i] = prim - prim[int(np.argmin(prim))]
            if it >= max_iter:
                hard[jv] = int(np.argmin(total)) - bsum
    return hard
