"""Binary BP on circulant codes via rolled message planes — the TPU fast path.

For ``H = [circulant(c) | I]`` (the HQC attack code family, make_code.py:220-273)
every nonzero diagonal of the circulant is one ``[batch, N]`` message plane;
check/variable alignment is a static ``jnp.roll`` per plane.  The decoder is
pure elementwise math with zero gathers or scatters — check update reduces
across the plane axis, variable update rolls planes into variable alignment and
back.  The identity block's variables have degree 1, so their v2c messages are
their channel priors, constant across iterations.

This replaces the reference's per-frame sparse CPU decode (ldpc.bp_decoder on a
17669-to-57637-column matrix, hqc.py:694-708) with a batched, HBM-bandwidth-
bound kernel.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..codes.layout import CirculantLayout
from .binary_bp import _check_update, _BIG


@partial(jax.jit, static_argnames=("shifts", "with_identity", "max_iter", "method"))
def _circulant_bp(
    prior_c,  # [B, N] error-prior LLR of circulant-part variables
    prior_i,  # [B, N] identity-part priors (ignored if not with_identity)
    syndrome,  # [B, N] (R == N for square circulants)
    shifts: tuple,
    with_identity: bool,
    max_iter: int,
    method: str,
):
    b, n = syndrome.shape
    w = len(shifts)
    sign_flip = 1.0 - 2.0 * syndrome.astype(jnp.float32)

    # v2c planes, check-major: plane t, position i = msg from var (i - k_t) to check i.
    v2c_c0 = jnp.stack([jnp.roll(prior_c, k, axis=-1) for k in shifts], axis=1)

    def check_and_var(v2c_c):
        if with_identity:
            v2c = jnp.concatenate([v2c_c, prior_i[:, None, :]], axis=1)
        else:
            v2c = v2c_c
        mask = jnp.ones(v2c.shape[1], dtype=bool)[None, :, None]
        c2v = _check_update(
            jnp.swapaxes(v2c, 1, 2), sign_flip, jnp.swapaxes(mask, 1, 2), method
        )
        c2v = jnp.swapaxes(c2v, 1, 2)  # back to [B, planes, N]

        c2v_c = c2v[:, :w, :]
        # Variable alignment: var j of plane t sits at check (j + k_t).
        c2v_var = jnp.stack(
            [jnp.roll(c2v_c[:, t, :], -k, axis=-1) for t, k in enumerate(shifts)], axis=1
        )
        total_c = prior_c + jnp.sum(c2v_var, axis=1)
        v2c_var = jnp.clip(total_c[:, None, :] - c2v_var, -_BIG, _BIG)
        v2c_c_new = jnp.stack(
            [jnp.roll(v2c_var[:, t, :], k, axis=-1) for t, k in enumerate(shifts)], axis=1
        )
        if with_identity:
            total_i = prior_i + c2v[:, w, :]
        else:
            total_i = None
        return v2c_c_new, total_c, total_i

    def syndrome_of(e_c, e_i):
        planes = [jnp.roll(e_c, k, axis=-1) for k in shifts]
        s = sum(planes)
        if with_identity:
            s = s + e_i
        return s % 2

    def body(state):
        it, v2c_c, e_out_c, e_out_i, conv = state
        v2c_c_new, total_c, total_i = check_and_var(v2c_c)
        e_c = (total_c < 0).astype(jnp.int32)
        e_i = (total_i < 0).astype(jnp.int32) if with_identity else jnp.zeros_like(e_c)
        ok = jnp.all(syndrome_of(e_c, e_i) == syndrome, axis=-1)
        e_out_c = jnp.where(conv[:, None], e_out_c, e_c)
        e_out_i = jnp.where(conv[:, None], e_out_i, e_i)
        return it + 1, v2c_c_new, e_out_c, e_out_i, conv | ok

    def cond(state):
        it, _, _, _, conv = state
        return (it < max_iter) & ~jnp.all(conv)

    e0 = (prior_c < 0).astype(jnp.int32)
    e0i = (prior_i < 0).astype(jnp.int32)
    state = (jnp.int32(0), v2c_c0, e0, e0i, jnp.zeros((b,), bool))
    it, _, e_c, e_i, conv = jax.lax.while_loop(cond, body, state)
    if with_identity:
        e = jnp.concatenate([e_c, e_i], axis=-1)
    else:
        e = e_c
    return e, conv, it


class CirculantBPDecoder:
    """Batched syndrome BP decoder over a :class:`CirculantLayout`."""

    def __init__(self, layout: CirculantLayout, max_iter=50, method="product_sum"):
        self.layout = layout
        self.max_iter = int(max_iter)
        self.method = method

    @staticmethod
    def _to_llr(p_error, n, b):
        p = jnp.clip(jnp.asarray(p_error, jnp.float32), 1e-30, 1 - 1e-12)
        llr = jnp.log((1.0 - p) / p)
        return jnp.broadcast_to(llr, (b, n))

    def decode_syndrome(self, syndrome, channel_probs, return_aux=False):
        """channel_probs: [n_vars] or [B, n_vars] per-position error probability."""
        squeeze = np.ndim(syndrome) == 1
        syn = jnp.atleast_2d(jnp.asarray(syndrome, jnp.int32))
        b = syn.shape[0]
        lay = self.layout
        cp = jnp.atleast_2d(jnp.asarray(channel_probs, jnp.float32))
        prior_c = self._to_llr(cp[..., : lay.n], lay.n, b)
        if lay.with_identity:
            prior_i = self._to_llr(cp[..., lay.n :], lay.n, b)
        else:
            prior_i = jnp.zeros((b, lay.n), jnp.float32)
        e, conv, it = _circulant_bp(
            prior_c, prior_i, syn, lay.shifts, lay.with_identity, self.max_iter, self.method
        )
        if squeeze:
            e, conv = e[0], conv[0]
        return (e, conv, it) if return_aux else e

    def decode_received(self, z, channel_probs):
        squeeze = np.ndim(z) == 1
        z = jnp.atleast_2d(jnp.asarray(z, jnp.int32))
        lay = self.layout
        z_c, z_i = z[..., : lay.n], z[..., lay.n :] if lay.with_identity else None
        syn = sum(jnp.roll(z_c, k, axis=-1) for k in lay.shifts)
        if lay.with_identity:
            syn = syn + z_i
        e = self.decode_syndrome(syn % 2, channel_probs)
        out = (z + e) % 2
        return out[0] if squeeze else out
