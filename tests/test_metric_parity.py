"""Numerical validation of the metric-network ports against torch.

Runs the offline parity checkers (seeded random weights — see
scripts/check_inception_parity.py's docstring for why that validates the
full numeric pipeline without the released weight files). Skipped when torch
is unavailable.
"""

import os
import sys

import pytest


torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "scripts"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def test_inception_port_matches_torch():
    from check_inception_parity import run_check

    results = run_check(quick=True)  # 299-native path only (CI speed)
    diff, mag = results["299"]
    assert diff < 1e-3 * max(mag, 1.0)


def test_vgg_port_matches_torch():
    from check_vgg_parity import run_check

    run_check()  # asserts internally on both input paths
