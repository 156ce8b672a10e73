"""Driver-contract checks for __graft_entry__.py."""

import sys
import pathlib

import jax
import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import __graft_entry__ as ge


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    state, metrics = fn(*args)
    assert np.isfinite(float(metrics["gam1"]))
    state2, metrics2 = fn(state, args[1])
    assert int(metrics2["it"]) == 2


@pytest.mark.slow
def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)
