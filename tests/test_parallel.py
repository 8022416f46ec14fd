"""Multi-device sharding tests (8 virtual CPU devices via conftest)."""

import numpy as np
import pytest

import jax

from sca_ldpc_tpu.codes.layout import CirculantLayout, CodeLayout
from sca_ldpc_tpu.codes.make_code import (
    make_regular_ldpc_parity_check_matrix,
    random_circulant_first_row,
)
from sca_ldpc_tpu.parallel import make_mesh, sharded_fer_simulation
from sca_ldpc_tpu.parallel.fer import make_sharded_fer_step
from sca_ldpc_tpu.utils import make_random_state


@pytest.fixture(scope="module")
def devices():
    d = jax.devices()
    if len(d) < 8:
        pytest.skip("needs 8 virtual devices")
    return d


def test_mesh_shapes(devices):
    mesh = make_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh()  # all devices on data
    assert mesh.shape["data"] == len(devices)
    with pytest.raises(ValueError):
        make_mesh(data=3, model=2)


def test_sharded_fer_circulant(devices):
    rng = make_random_state(0)
    n = 64
    row = random_circulant_first_row(n, 5, rng)
    lay = CirculantLayout.from_first_row(row, with_identity=True)
    probs = np.full(2 * n, 0.01, np.float32)
    mesh = make_mesh(data=4, model=2)
    with mesh:
        successes, frames = sharded_fer_simulation(
            lay, probs, runs=64, key=jax.random.PRNGKey(0), mesh=mesh, max_iter=20
        )
    assert frames >= 64
    # at 1% error on a w=5 circulant code nearly all frames decode
    assert successes / frames > 0.9


def test_sharded_fer_general_layout(devices):
    rng = make_random_state(1)
    H = make_regular_ldpc_parity_check_matrix(48, 24, 3, 6, rng)
    lay = CodeLayout.from_h(H)
    probs = np.full(48, 0.01, np.float32)
    mesh = make_mesh()  # pure data parallelism
    with mesh:
        successes, frames = sharded_fer_simulation(
            lay, probs, runs=64, key=jax.random.PRNGKey(1), mesh=mesh, max_iter=30
        )
    assert successes / frames > 0.9


def test_sharded_matches_unsharded(devices):
    """Same key, same step: 1-device mesh result == 8-device mesh result."""
    rng = make_random_state(2)
    n = 32
    row = random_circulant_first_row(n, 3, rng)
    lay = CirculantLayout.from_first_row(row, with_identity=True)
    probs = np.full(2 * n, 0.02, np.float32)

    mesh8 = make_mesh(data=8, model=1)
    mesh1 = make_mesh(data=1, model=1, devices=[devices[0]])
    key = jax.random.PRNGKey(7)
    with mesh8:
        s8 = make_sharded_fer_step(lay, probs, mesh8, max_iter=15)(key, 32)
    with mesh1:
        s1 = make_sharded_fer_step(lay, probs, mesh1, max_iter=15)(key, 32)
    assert int(s8[0]) == int(s1[0])


def test_dryrun_multichip_entry():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_multiprocess_matches_single_process(devices):
    """REAL multi-controller run: 2 jax.distributed processes x 4 CPU devices
    (gloo collectives) produce bit-identical global FER counts to one
    process with 8 devices — the multi-host path end-to-end, not just a
    virtual mesh (scripts/multihost_fer.py)."""
    import json
    import socket
    import subprocess
    import sys
    from pathlib import Path

    script = Path(__file__).resolve().parent.parent / "scripts" / "multihost_fer.py"
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    common = [sys.executable, str(script), "--runs", "128", "--n", "127",
              "--code-weight", "3", "--error-rate", "0.02", "--seed", "3"]

    single = subprocess.run(
        common + ["--force-cpu-devices", "8"],
        capture_output=True, text=True, timeout=240,
    )
    assert single.returncode == 0, single.stderr[-2000:]
    ref = json.loads(single.stdout.strip().splitlines()[-1])

    procs = [
        subprocess.Popen(
            common + ["--force-cpu-devices", "4",
                      "--coordinator", f"localhost:{port}",
                      "--num-processes", "2", "--process-id", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=240) for p in procs]
    assert all(p.returncode == 0 for p in procs), [o[1][-2000:] for o in outs]
    got = json.loads(outs[0][0].strip().splitlines()[-1])

    assert got["process_count"] == 2 and got["device_count"] == 8
    assert got["successes"] == ref["successes"]
    assert got["frames"] == ref["frames"]


def test_sharded_masked_attack_decode(devices):
    """8 independent masked-circulant attack decodes sharded over the mesh
    equal the unsharded per-instance decodes exactly."""
    import jax.numpy as jnp

    from sca_ldpc_tpu.ops.circulant_bp import _multi_circulant_bp
    from sca_ldpc_tpu.parallel import make_sharded_masked_decode

    N, P, W, I = 64, 2, 4, 8
    rng = make_random_state(9)
    prior_c = np.zeros((I, N), np.float32)
    prior_i = np.zeros((I, P, N), np.float32)
    syn = np.zeros((I, P, N), np.int32)
    shifts = np.zeros((I, P, W), np.int32)
    big = float(np.log((1 - 1e-9) / 1e-9))
    for i in range(I):
        y = np.zeros(N, np.int8)
        y[rng.choice(N, 4, replace=False)] = 1
        prior_c[i] = np.log((1 - 4 / N) / (4 / N))
        for p in range(P):
            shifts[i, p] = np.sort(rng.choice(N, W, replace=False))
            par = sum(np.roll(y, int(k)).astype(int) for k in shifts[i, p]) % 2
            meas = rng.rand(N) < 0.6
            syn[i, p] = np.where(meas, par, 0)
            prior_i[i, p] = np.where(meas, big, 0.0)

    mesh = make_mesh(data=4, model=2)
    with mesh:
        decode = make_sharded_masked_decode(mesh, max_iter=30)
        e_c, e_i, conv = decode(
            jnp.asarray(prior_c), jnp.asarray(prior_i),
            jnp.asarray(syn), jnp.asarray(shifts),
        )
    e_c, e_i, conv = np.asarray(e_c), np.asarray(e_i), np.asarray(conv)

    for i in range(I):
        rc, ri, rconv, _ = _multi_circulant_bp(
            jnp.asarray(prior_c[i : i + 1]), jnp.asarray(prior_i[i : i + 1]),
            jnp.asarray(syn[i : i + 1]), jnp.asarray(shifts[i]), 30, "product_sum",
        )
        assert (np.asarray(rc[0]) == e_c[i]).all()
        assert (np.asarray(ri[0]) == e_i[i]).all()
        assert bool(rconv[0]) == bool(conv[i])
