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


def test_sharded_qary_fer(devices):
    """Sharded q-ary FER step: on-device channel sampling + batched decode;
    8-device and 1-device meshes produce IDENTICAL statistics (the sharding
    constraint must not change values), and success statistics are sane."""
    from sca_ldpc_tpu.codes.make_code import make_qc_parity_check_matrix
    from sca_ldpc_tpu.ops.qary import QaryDecoder
    from sca_ldpc_tpu.parallel.qary import make_sharded_qary_fer_step

    rng = make_random_state(5)
    H = make_qc_parity_check_matrix(16, 3, 2, rng)
    dec = QaryDecoder(H.astype(np.int8), b_range=1, max_iter=8)

    mesh8 = make_mesh(data=8, model=1)
    mesh1 = make_mesh(data=1, model=1, devices=[devices[0]])
    key = jax.random.PRNGKey(3)
    with mesh8:
        s8 = make_sharded_qary_fer_step(dec, 0.05, mesh8)(key, 32)
    with mesh1:
        s1 = make_sharded_qary_fer_step(dec, 0.05, mesh1)(key, 32)
    r8 = [int(x) for x in s8]
    r1 = [int(x) for x in s1]
    assert r8 == r1
    succ, max_ok, min_fail, frames = r8
    assert 0 <= succ <= frames == 32
    if succ:
        assert max_ok >= 1  # every frame has >= 1 noisy symbol (redraw rule)


def test_sharded_qary_fer_simulation_runs(devices):
    from sca_ldpc_tpu.codes.make_code import make_qc_parity_check_matrix
    from sca_ldpc_tpu.ops.qary import QaryDecoder
    from sca_ldpc_tpu.parallel.qary import sharded_qary_fer_simulation

    rng = make_random_state(6)
    H = make_qc_parity_check_matrix(16, 3, 2, rng)
    dec = QaryDecoder(H.astype(np.int8), b_range=1, max_iter=8)
    mesh = make_mesh(data=4, model=2)
    with mesh:
        succ, max_ok, min_fail, frames = sharded_qary_fer_simulation(
            dec, 0.05, 40, jax.random.PRNGKey(1), mesh
        )
    assert frames >= 40
    assert 0 <= succ <= frames
    assert min_fail is None or min_fail >= 1


def test_sharded_special_decode_matches_unsharded(devices):
    """Batch-sharded two-alphabet decode == per-instance unsharded decode."""
    from sca_ldpc_tpu.ops.qary_special import QarySpecialDecoder
    from sca_ldpc_tpu.parallel.qary import make_sharded_special_decode

    rng = make_random_state(7)
    nb, r, sw, b, bsum = 24, 8, 3, 2, 6
    H = np.zeros((r, nb + r), np.int8)
    for i in range(r):
        cols = rng.choice(nb, sw, replace=False)
        H[i, cols] = rng.choice([-1, 1], sw)
        H[i, nb + i] = 1
    dec = QarySpecialDecoder(H, b, bsum, max_iter=6)

    I = 8
    p_b = rng.rand(I, nb, 2 * b + 1).astype(np.float32) + 0.1
    p_b /= p_b.sum(-1, keepdims=True)
    p_s = rng.rand(I, r, 2 * bsum + 1).astype(np.float32) + 0.1
    p_s /= p_s.sum(-1, keepdims=True)

    mesh = make_mesh(data=8, model=1)
    with mesh:
        sharded = make_sharded_special_decode(dec, mesh)
        hard_sharded = np.asarray(sharded(p_b, p_s))

    hard_ref = np.asarray(dec.min_sum(p_b, p_s))
    assert (hard_sharded == hard_ref).all()


def test_sharded_attack_decode_vmapped_instances(devices):
    """>1 instance per device: the vmapped shard body must equal the
    per-instance reference decode exactly (round-1 ran these sequentially)."""
    import jax.numpy as jnp

    from sca_ldpc_tpu.ops.circulant_bp import _multi_circulant_bp
    from sca_ldpc_tpu.parallel import make_sharded_masked_decode

    N, P, W, I = 48, 2, 3, 16  # 16 instances on 8 devices -> 2 per device
    rng = make_random_state(11)
    prior_c = np.zeros((I, N), np.float32)
    prior_i = np.zeros((I, P, N), np.float32)
    syn = np.zeros((I, P, N), np.int32)
    shifts = np.zeros((I, P, W), np.int32)
    big = float(np.log((1 - 1e-9) / 1e-9))
    for i in range(I):
        y = np.zeros(N, np.int8)
        y[rng.choice(N, 3, replace=False)] = 1
        prior_c[i] = np.log((1 - 3 / N) / (3 / N))
        for p in range(P):
            shifts[i, p] = np.sort(rng.choice(N, W, replace=False))
            par = sum(np.roll(y, int(k)).astype(int) for k in shifts[i, p]) % 2
            meas = rng.rand(N) < 0.7
            syn[i, p] = np.where(meas, par, 0)
            prior_i[i, p] = np.where(meas, big, 0.0)

    mesh = make_mesh(data=8, model=1)
    with mesh:
        decode = make_sharded_masked_decode(mesh, max_iter=30)
        e_c, e_i, conv = decode(
            jnp.asarray(prior_c), jnp.asarray(prior_i),
            jnp.asarray(syn), jnp.asarray(shifts),
        )
    e_c, conv = np.asarray(e_c), np.asarray(conv)

    for i in range(I):
        rc, _ri, rconv, _ = _multi_circulant_bp(
            jnp.asarray(prior_c[i : i + 1]), jnp.asarray(prior_i[i : i + 1]),
            jnp.asarray(syn[i : i + 1]), jnp.asarray(shifts[i]), 30,
            "product_sum",
        )
        assert (np.asarray(rc[0]) == e_c[i]).all()
        assert bool(rconv[0]) == bool(conv[i])
