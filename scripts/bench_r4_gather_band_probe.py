#!/usr/bin/env python
"""Round-4: the gather engine has a slow BAND, not a cliff (measured
2026-08-21, bench_r4_gather_curve_probe): ~1.7 ns/row at <=67 MB,
~5.7 ns/row at 134-537 MB, ~1.8 ns/row again at >=1 GB.  This probe
maps the band's upper edge and tests the BAND-ESCAPE exploit: is the
regime keyed on the BUFFER size (then zero-padding h out of the band
makes 1M-node gathers ~3x faster) or on the accessed address range?

Cases (R = 8M random rows each):
  4M rows bf16 (1.07 GB)         band upper edge
  8.4M rows bf16 (2.1 GB)        replicate the fast point
  8.4M rows int8 (1.07 GB)       replicate the suspicious 0.03 ns point
  pad-escape A: 2.1 GB buffer, idx < 262144 (67 MB accessed)
  pad-escape B: 2.1 GB buffer, idx < 1048576 (268 MB accessed = the 1M
                operating point)  <-- the decision case
  control: 1M rows bf16 (268 MB buffer, same idx as B)

Run ON THE TPU: python -u scripts/bench_r4_gather_band_probe.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

K = 5
R = 8_000_000


def timeit(fn):
    fn()
    fn()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


@functools.partial(jax.jit, static_argnames=("k",))
def gather_chain(table, idx, k):
    def body(i, acc):
        g = table[idx]
        # fold a data-dependent scalar back into acc so iterations chain
        return acc + g[:8].astype(jnp.float32) + 1e-30 * acc[0, 0]
    acc = jax.lax.fori_loop(0, k, body,
                            jnp.zeros((8, table.shape[1]), jnp.float32))
    return jnp.sum(acc)


def run(tag, n_rows, dt, idx_max=None):
    D = 128
    rng = np.random.default_rng(1)
    idx = jnp.asarray(rng.integers(0, idx_max or n_rows, R), jnp.int32)
    table = jnp.asarray(rng.integers(-100, 100, (n_rows, D)), dt)
    t1 = timeit(lambda: float(gather_chain(table, idx, k=1)))
    tk = timeit(lambda: float(gather_chain(table, idx, k=K)))
    per = (tk - t1) / (K - 1)
    if per <= 0:
        per = tk / K
    mb = n_rows * D * jnp.dtype(dt).itemsize / 1e6
    print(f"{tag:28s} buf={mb:6.0f}MB idx<{idx_max or n_rows:>9} "
          f"{per * 1e3:8.2f} ms  {per / R * 1e9:5.2f} ns/row", flush=True)
    table.delete()


def main():
    print(f"device: {jax.devices()[0]}  R={R}", flush=True)
    run("4M rows bf16", 4_194_304, jnp.bfloat16)
    run("8.4M rows bf16 (replicate)", 8_388_608, jnp.bfloat16)
    run("8.4M rows int8 (replicate)", 8_388_608, jnp.int8)
    run("pad-escape A (67MB acc)", 8_388_608, jnp.bfloat16,
        idx_max=262_144)
    run("pad-escape B (1M acc)", 8_388_608, jnp.bfloat16,
        idx_max=1_048_576)
    run("control 1M buf (1M acc)", 1_048_576, jnp.bfloat16,
        idx_max=1_048_576)


if __name__ == "__main__":
    main()
