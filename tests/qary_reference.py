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
