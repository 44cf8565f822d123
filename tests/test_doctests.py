"""Doctest runner for ops modules (reference ``poe test`` parity: its pytest
invocation uses ``--doctest-modules``, reference ``pyproject.toml:98``)."""

import doctest

import multimodal_mtrssm_tpu.ops.fusion as fusion
import multimodal_mtrssm_tpu.ops.likelihood as likelihood


def test_doctests():
    for mod in (fusion, likelihood):
        results = doctest.testmod(mod, verbose=False)
        assert results.failed == 0, f"{mod.__name__}: {results.failed} doctest failures"
        assert results.attempted > 0, f"{mod.__name__}: no doctests collected"
