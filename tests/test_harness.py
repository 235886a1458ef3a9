"""Guard: the virtual 8-device CPU mesh must be real, else every
"distributed" test silently degenerates to one shard — and the driver
dryrun gate must be oracle-sensitive, not an isfinite rubber stamp."""
import sys

import jax
import pytest


def test_virtual_mesh_present():
    devs = jax.devices()
    assert len(devs) == 8, devs
    assert all(d.platform == "cpu" for d in devs)


def test_dryrun_gate_fails_on_broken_permute():
    """Fault-injection self-test for the driver gate: with one forward-
    permute round's gather slots deliberately misaligned, the first
    oracle-checked leg must FAIL. If this passes, the gate has regressed
    to finiteness-only and wrong-answer bugs would ship."""
    import os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    try:
        import __graft_entry__ as ge
    finally:
        sys.path.remove(root)
    with pytest.raises(AssertionError, match="oracle FAIL"):
        ge._dryrun_multichip_impl(2, _corrupt=True)
