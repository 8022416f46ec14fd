"""Channel model conformance (reference: decode.py:42-127 doctests)."""

import numpy as np
import pytest

from sca_ldpc_tpu.channels import ErrorsProvider
from sca_ldpc_tpu.utils import make_random_state

from pathlib import Path

FIXTURES = Path(__file__).resolve().parent.parent / "fixtures"

BINARY_FILE = str(FIXTURES / "binary_distr.txt")
QARY_FILE = str(FIXTURES / "qary_distr.txt")


def test_uniform_rate_host():
    rng = make_random_state(0)
    ep = ErrorsProvider(0.05, None, rng)
    n = 10000
    s = sum(ep.get_error(0) for _ in range(n))
    assert abs(s / n - 0.05) < 0.009


def test_binary_file_host():
    rng = make_random_state(0)
    ep = ErrorsProvider(0.05, BINARY_FILE, rng)
    n = 10000
    for i, expect in enumerate([0.1, 0.3, 0.05, 0.14]):
        s = sum(ep.get_error(i) for _ in range(n))
        assert abs(s / n - expect) < 0.009
    # positions wrap modulo file length
    s = sum(ep.get_error(4) for _ in range(n))
    assert abs(s / n - 0.1) < 0.009


def test_qary_file_host():
    rng = make_random_state(0)
    ep = ErrorsProvider(0.05, QARY_FILE, rng)
    n = 10000
    expected = [{-1: 0.2, 0: 0.5, 1: 0.3}, {-1: 0.1, 0: 0.6, 1: 0.3}]
    for i, expect in enumerate(expected):
        counts = {}
        for _ in range(n):
            e = ep.get_error(i)
            counts[e] = counts.get(e, 0) + 1
        for val, prob in expect.items():
            assert abs(counts.get(val, 0) / n - prob) < 0.009


def test_binary_channel_probs():
    ep = ErrorsProvider(0.05, BINARY_FILE, make_random_state(0))
    assert ep.get_binary_channel_probs() == [0.1, 0.3, 0.05, 0.14]
    assert ep.get_binary_channel_probs(6) == [0.1, 0.3, 0.05, 0.14, 0.1, 0.3]
    assert ep.get_error_rate() is None
    ep2 = ErrorsProvider(0.02, None, make_random_state(0))
    assert ep2.get_binary_channel_probs() == [None]
    assert ep2.get_error_rate() == 0.02


def test_qary_channel_probs_raises_for_binary_query():
    ep = ErrorsProvider(0.05, QARY_FILE, make_random_state(0))
    with pytest.raises(ValueError):
        ep.get_binary_channel_probs()


def test_sample_batch_binary_stats():
    import jax

    ep = ErrorsProvider(0.05, BINARY_FILE, make_random_state(0))
    key = jax.random.PRNGKey(0)
    x = np.asarray(ep.sample_batch(key, 4000, 4))
    assert x.shape == (4000, 4)
    freqs = x.mean(axis=0)
    for f, expect in zip(freqs, [0.1, 0.3, 0.05, 0.14]):
        assert abs(f - expect) < 0.03


def test_sample_batch_qary_stats():
    import jax

    ep = ErrorsProvider(0.05, QARY_FILE, make_random_state(0))
    key = jax.random.PRNGKey(1)
    x = np.asarray(ep.sample_batch(key, 6000, 2))
    assert set(np.unique(x)) <= {-1, 0, 1}
    p0 = (x[:, 0] == -1).mean()
    assert abs(p0 - 0.2) < 0.03
    p1 = (x[:, 1] == 0).mean()
    assert abs(p1 - 0.6) < 0.03
