"""Run embedded doctest examples (the reference's primary test mechanism,
main.py:282-319, is doctest discovery; ours live in pytest but the docstring
examples stay executable)."""

import doctest

import pytest

import sca_ldpc_tpu.models.hqc.attack as attack_mod
import sca_ldpc_tpu.utils.rng as rng_mod


@pytest.mark.parametrize("mod", [attack_mod, rng_mod])
def test_doctests(mod):
    results = doctest.testmod(mod, verbose=False)
    assert results.failed == 0, f"{results.failed} doctest failures in {mod.__name__}"
    assert results.attempted > 0
