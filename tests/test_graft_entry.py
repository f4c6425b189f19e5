"""Validate the driver contract: entry() compiles single-chip, and
dryrun_multichip runs a real dp-sharded train step on the 8-device CPU mesh."""
import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as ge  # noqa: E402


def test_entry_compiles():
    fn, args = ge.entry()
    rgba, reg = jax.jit(fn)(*args)
    assert rgba.shape[-1] == 4
    assert reg.shape == ()


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)


def test_dryrun_multichip_2():
    ge.dryrun_multichip(2)
