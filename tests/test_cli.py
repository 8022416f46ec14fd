"""CLI command-surface smoke tests (reference: main.py commands)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args, timeout=240):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys; sys.argv = ['main'] + %r;"
         "from sca_ldpc_tpu.cli.main import main; main()" % (list(args),)],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )


def test_unknown_command_fails():
    r = run_cli("not_a_command")
    assert r.returncode == 1


def test_official_example():
    r = run_cli("official_example", "--seed", "0", "--runs", "10", "--error-rate", "0.05")
    assert r.returncode == 0
    assert "Success ratio 10/10" in r.stderr + r.stdout


def test_compute_bound():
    r = run_cli("compute_bound", "--error-rate", "0.11")
    assert r.returncode == 0
    out = r.stderr + r.stdout
    assert "C, where R = " in out


def test_regular_ldpc_code():
    r = run_cli("regular_ldpc_code", "--seed", "0", "--runs", "5", "--error-rate", "0.01")
    assert r.returncode == 0
    assert "Success ratio" in r.stderr + r.stdout


def test_view_hqc_oracle_accuracy():
    png = os.path.join(REPO, "OracleAccuracy.png")
    try:
        r = run_cli("view_hqc_oracle_accuracy")
        assert r.returncode == 0
        assert os.path.exists(png)
    finally:
        if os.path.exists(png):
            os.remove(png)


def test_persistent_compilation_cache_util(tmp_path, monkeypatch):
    import jax

    from sca_ldpc_tpu.utils import enable_persistent_compilation_cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        d = enable_persistent_compilation_cache(cache_dir=str(tmp_path / "c"))
        assert d == str(tmp_path / "c")
        assert jax.config.jax_compilation_cache_dir == d
        # opt-out env var disables without touching config
        monkeypatch.setenv("SCA_LDPC_NO_JAX_CACHE", "1")
        assert enable_persistent_compilation_cache(cache_dir=str(tmp_path / "x")) is None
        assert jax.config.jax_compilation_cache_dir == d
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
