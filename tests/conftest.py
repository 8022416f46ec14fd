"""Test configuration: run on CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (the driver separately
compile-checks the real-TPU path with __graft_entry__).

The environment injects a TPU (axon) PJRT plugin into every Python process
via sitecustomize, whose register() overrides jax_platforms to "axon,cpu";
each process then claims the single TPU on first backend init, and two
concurrent claimers deadlock.  Flipping the config back to "cpu" before any
backend initialization keeps the whole test suite off the TPU.
"""

import os
import sys
from pathlib import Path

# Make the repo root (bench.py, __graft_entry__.py) and tests/ (shared
# helpers like qary_reference) importable regardless of invocation mode/cwd.
_ROOT = Path(__file__).resolve().parent.parent
for _p in (str(_ROOT), str(_ROOT / "tests")):
    if _p not in sys.path:
        sys.path.insert(0, _p)


_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
