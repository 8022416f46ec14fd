#!/usr/bin/env python
"""Capture a JAX profiler trace of the benchmark decode step.

Writes a TensorBoard-compatible trace directory (XPlane protos) — the
framework's profiling hook (SURVEY §5's "JAX profiler traces" aux item).

    python scripts/profile_trace.py --out /tmp/sca_trace
    tensorboard --logdir /tmp/sca_trace   # offline inspection
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sca_trace")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--error-rate", type=float, default=0.01)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_code
    from sca_ldpc_tpu.ops.kernels.circulant_pallas import circulant_fer_pallas

    lay = build_code()
    n = lay.n
    probs = jnp.full((2 * n,), args.error_rate, jnp.float32)

    @jax.jit
    def step(key):
        e = jax.random.bernoulli(key, probs[None, :], (args.batch, 2 * n)).astype(jnp.int8)
        return jnp.sum(circulant_fer_pallas(e, lay.shifts, args.error_rate, 30)[0])

    # compile outside the trace
    out = step(jax.random.PRNGKey(0))
    jax.block_until_ready(out)

    with jax.profiler.trace(args.out):
        for i in range(args.steps):
            out = step(jax.random.PRNGKey(i + 1))
        jax.block_until_ready(out)
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()
