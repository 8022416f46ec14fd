"""Probability -> LLR conversions.

Two conventions coexist in the reference and both are kept:

- Binary BP uses the standard log-likelihood ratio
  ``L = ln(P(0) / P(1))`` built from per-position error probabilities
  (the ldpc package's channel_probs, decode.py:155-161).
- The q-ary decoders use "min-sum LLRs" relative to the most likely symbol:
  ``llr[d] = ln(max_p / p[d])`` with ``+inf`` for zero-probability symbols
  (reference: decoder.rs:668-692 ``into_llr``).
"""

import jax.numpy as jnp


def binary_prior_llr(p_error):
    """LLR of a binary prior: ``ln((1-p)/p)`` elementwise."""
    p = jnp.clip(p_error, 1e-30, 1.0 - 1e-12)
    return jnp.log((1.0 - p) / p)


def probs_to_llr(probs, axis=-1, validate=False):
    """Q-ary min-sum LLRs: ``ln(max / p)`` along ``axis``; zeros map to +inf.

    Matches decoder.rs:668-692 exactly (including that probabilities are
    assumed to sum to ~1; set ``validate=True`` to assert it like the Rust
    code does).
    """
    probs = jnp.asarray(probs, dtype=jnp.float32)
    if validate:
        s = probs.sum(axis=axis)
        import numpy as np

        if not (np.all(np.abs(np.asarray(s) - 1.0) < 1e-3)):
            raise ValueError("channel probabilities must sum to 1 (+-0.001)")
    mx = probs.max(axis=axis, keepdims=True)
    return jnp.where(probs > 0, jnp.log(mx / jnp.where(probs > 0, probs, 1.0)), jnp.inf)
