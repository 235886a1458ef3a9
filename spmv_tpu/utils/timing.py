"""Phase timing + roofline harness.

TPU-native analogue of the reference demo's timing machinery
(reference demos/spmv.cpp:84-130: MPI_Barrier-fenced phase timers with a
min/max-over-ranks report). Here a phase is fenced by a *real* device sync:
on the axon TPU tunnel, ``block_until_ready`` does not actually wait for
execution, so every measurement transfers a scalar to the host (see
.claude/skills/verify/SKILL.md gotchas). Chained iterations (output feeds
the next input) defeat the tunnel's identical-call caching.
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def device_sync(x: jax.Array) -> float:
    """Force true completion: pull one scalar to host, return it."""
    return float(np.asarray(jax.device_get(x if x.ndim == 0 else x.ravel()[-1])))


class PhaseTimer:
    """Accumulating named phase timers (demos/spmv.cpp:33 timing-map parity)."""

    def __init__(self):
        self.acc: dict[str, float] = {}

    def time(self, name: str, fn: Callable, *args, sync=None):
        t0 = time.perf_counter()
        out = fn(*args)
        if sync is not None:
            device_sync(sync(out) if callable(sync) else out)
        dt = time.perf_counter() - t0
        self.acc[name] = self.acc.get(name, 0.0) + dt
        return out

    def add(self, name: str, seconds: float) -> None:
        self.acc[name] = self.acc.get(name, 0.0) + seconds

    def report(self) -> str:
        total = sum(self.acc.values())
        lines = ["[------------------ Timings ------------------]",
                 f"{'Phase':<24}{'seconds':>12}"]
        for name in sorted(self.acc):
            lines.append(f"{name:<24}{self.acc[name]:>12.6f}")
        lines.append(f"{'Total':<24}{total:>12.6f}")
        return "\n".join(lines)


def bench_chained(step: Callable[[jax.Array], jax.Array], x0: jax.Array,
                  iters: int, warmup: int = 3) -> float:
    """Median seconds/iteration of a chained x -> step(x) loop with a true
    device sync per measurement batch."""
    x = x0
    for _ in range(warmup):
        x = step(x)
    device_sync(x)
    # several batches for a median, each batch truly synced
    batch = max(1, iters // 5)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(batch):
            x = step(x)
        device_sync(x)
        times.append((time.perf_counter() - t0) / batch)
    return float(np.median(times))


def measure_copy_bandwidth_gbs(nbytes: int = 256 * 1024 * 1024) -> float:
    """Empirical streaming bandwidth (read+write) of the attached device via
    a chained scale-by-1 loop — the denominator for roofline fractions.
    Self-calibrating: no hard-coded HBM spec for whatever chip the tunnel
    exposes."""
    n = nbytes // 4
    # (rows, 128) lane layout — big 1-D arrays hit slow paths on TPU
    x0 = jnp.ones((n // 128, 128), jnp.float32)
    f = jax.jit(lambda v: v * jnp.float32(1.0000001))
    sec = bench_chained(f, x0, iters=10)
    return 2 * x0.size * 4 / sec / 1e9


def spmv_traffic_bytes(format_bytes: int, n_in: int, n_out: int, itemsize: int) -> int:
    """Minimum HBM traffic of one SpMV: matrix data + x read + y write."""
    return format_bytes + (n_in + n_out) * itemsize
