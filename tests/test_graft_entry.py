"""Driver hooks (__graft_entry__.py) stay green: entry() compiles and runs,
dryrun_multichip() executes a sharded step on the virtual 8-device mesh
the conftest provides."""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_executes():
    fn, args = graft.entry()
    compiled = jax.jit(fn).lower(*args).compile()
    out = compiled(*args)
    leaves = jax.tree_util.tree_leaves(out)
    assert leaves
    for leaf in leaves:
        assert np.all(np.isfinite(np.asarray(leaf, dtype=np.float64)))


def test_dryrun_multichip_runs_on_virtual_mesh():
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    graft.dryrun_multichip(8)
