"""Aux subsystems: timing + profiling smoke tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.utils.profiling import annotate, profile_region, profile_to
from spmv_tpu.utils.timing import PhaseTimer, device_sync


def test_phase_timer_report():
    t = PhaseTimer()
    t.add("0.MatCreate", 0.25)
    t.add("1.VecCreate", 0.5)
    t.add("0.MatCreate", 0.25)
    rep = t.report()
    assert "0.MatCreate" in rep and "Total" in rep
    assert abs(t.acc["0.MatCreate"] - 0.5) < 1e-12


def test_device_sync_returns_scalar():
    x = jnp.arange(16.0)
    assert device_sync(x) == 15.0
    assert device_sync(jnp.float32(3.5)) == 3.5


def test_profile_region_and_annotate():
    with profile_region("solve"):
        y = jnp.sum(jnp.ones((8, 8)))
    assert float(y) == 64.0

    f = annotate(lambda v: v * 2, "double")
    np.testing.assert_allclose(np.asarray(f(jnp.ones(4))), 2.0)


def test_profile_to_writes_trace(tmp_path):
    logdir = str(tmp_path / "trace")
    with profile_to(logdir):
        _ = jnp.dot(jnp.ones((64, 64)), jnp.ones((64, 64))).block_until_ready()
    # a trace directory with content must exist
    found = False
    for root, _dirs, files in os.walk(logdir):
        if files:
            found = True
    assert found, "no trace files written"
