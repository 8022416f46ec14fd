"""Persistent XLA compilation cache.

Attack decodes, FER sweeps and benchmarks reuse a small set of compile
shapes across process invocations; first-compile of the decode program is
10-40 s on TPU (dominating e.g. a full HQC-128 key recovery, whose decode
steady-state is ~4 s).  Enabling JAX's persistent compilation cache makes
every run after the first start warm (measured 13.3 s -> 1.0 s for a
representative program through this environment's TPU tunnel).

Called from the CLI, the sweep driver, and bench.py — not on package
import, so library users keep full control of global JAX config.

Environment:
- ``SCA_LDPC_JAX_CACHE_DIR``: cache location (default
  ``~/.cache/sca_ldpc_tpu/jax``).
- ``SCA_LDPC_NO_JAX_CACHE=1``: disable.
"""

import logging
import os

logger = logging.getLogger(__name__)

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "sca_ldpc_tpu", "jax"
)


def enable_persistent_compilation_cache(cache_dir=None, min_compile_secs=1.0):
    """Point JAX's persistent compilation cache at ``cache_dir``.

    No-op if ``SCA_LDPC_NO_JAX_CACHE=1`` or the cache dir is not writable.
    Safe to call multiple times and before or after backend init.
    """
    if os.environ.get("SCA_LDPC_NO_JAX_CACHE") == "1":
        return None
    cache_dir = cache_dir or os.environ.get("SCA_LDPC_JAX_CACHE_DIR", _DEFAULT_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError as e:
        logger.warning(f"compilation cache disabled ({cache_dir}: {e})")
        return None
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", float(min_compile_secs))
    logger.debug(f"persistent compilation cache at {cache_dir}")
    return cache_dir
