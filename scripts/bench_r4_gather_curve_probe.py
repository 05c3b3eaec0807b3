#!/usr/bin/env python
"""VERDICT r3 #4 gate: the measured gather rate-vs-footprint curve.

The int8 h-pack lead assumes halving the gathered table's footprint
(256 MB bf16 -> 128 MB int8 at 1M nodes) moves the per-row gather rate
toward the fast (~1.6 ns/row at <=67 MB) regime.  Measure the actual
curve: random-index gathers of R rows from tables of F MB, bf16 AND
int8, including the exact 1M-uniform operating points.

Run ON THE TPU: python -u scripts/bench_r4_gather_curve_probe.py
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
R = 8_000_000  # gathered rows per measurement (fixed across the curve)


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
    # HARD loop-carried dependency: idx is perturbed by a data-dependent
    # zero each iteration, so XLA cannot hoist the gather out of the
    # loop (the first version of this probe was LICM'd at >=2 GB tables
    # and reported a physically impossible 0.12 ns/row)
    def body(i, acc):
        zero = (acc[0, 0] * 1e-30).astype(idx.dtype)
        g = table[idx + zero]
        return acc + g[:8].astype(jnp.float32)
    acc = jax.lax.fori_loop(0, k, body,
                            jnp.zeros((8, table.shape[1]), jnp.float32))
    return jnp.sum(acc)


def main():
    D = 128
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}  R={R} rows/gather", flush=True)
    print(f"{'rows':>10} {'dtype':>8} {'MB':>7} {'ms':>8} {'ns/row':>7}",
          flush=True)
    for n_rows in (262_144, 524_288, 1_048_576, 2_097_152, 8_388_608,
                   16_777_216):
        idx = jnp.asarray(rng.integers(0, n_rows, R), jnp.int32)
        for dt, name in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8")):
            mb = n_rows * D * jnp.dtype(dt).itemsize / 1e6
            if mb > 6000:
                continue
            table = jnp.asarray(
                rng.integers(-100, 100, (n_rows, D)), dt)
            t1 = timeit(lambda: float(gather_chain(table, idx, k=1)))
            tk = timeit(lambda: float(gather_chain(table, idx, k=K)))
            per = (tk - t1) / (K - 1)
            if per <= 0:
                per = tk / K
            print(f"{n_rows:>10} {name:>8} {mb:>7.0f} {per * 1e3:>8.2f} "
                  f"{per / R * 1e9:>7.2f}", flush=True)


if __name__ == "__main__":
    main()
