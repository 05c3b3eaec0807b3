#!/usr/bin/env python
"""Gather engine rate vs index structure: the tight (16-aligned) pack
measured 6.5 ns/row where the tile-padded pack measured 11.6 — zero-index
jumps at tile boundaries halve the rate.  How much more is on the table?

  blocksort — per-128-dst-block ascending runs (the production layout)
  sorted    — globally ascending rows
  random    — unsorted
  seq       — hardware ceiling: row i reads i (pure streaming)

8.02M rows from a [4.2M, 128] bf16 table.
Run ON THE TPU: python -u scripts/bench_gather_probe.py
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

from ggnn_tpu.data.synthetic import synthetic_batch
from ggnn_tpu.ops.scatter_pallas import build_dst_block_layout

D, T = 128, 8
T2 = 2 * T


def timeit(fn, iters=6, warmup=2, tag=""):
    t0 = time.perf_counter()
    fn()
    comp = time.perf_counter() - t0
    for _ in range(warmup):
        fn()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{tag}: {best * 1e3:.2f} ms (compile {comp:.0f}s)", flush=True)
    return best


def main():
    batch = synthetic_batch(262_144, 4_000_000, T, annotation_dim=8, seed=0,
                            node_mult=128)
    N = batch.spec.n_pad
    lay = build_dst_block_layout(batch.edge_src, batch.edge_dst,
                                 batch.edge_type, batch.edge_mask, N,
                                 tile_e=2048, n_message_types=T2,
                                 edge_align=16)
    idx_block = np.asarray(lay.gather_idx)
    E = idx_block.shape[0]
    idx_sorted = np.sort(idx_block)
    idx_random = idx_block.copy()
    np.random.default_rng(0).shuffle(idx_random)
    idx_seq = (np.arange(E) % (T2 * N)).astype(np.int32)
    table = jax.random.normal(jax.random.PRNGKey(3), (T2 * N, D),
                              dtype=jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(tbl, idx, k):
        def body(i, carry):
            tbl, tot = carry
            msgs = tbl[idx]
            s = jnp.sum(msgs[::65536, 0].astype(jnp.float32))
            tbl = tbl.at[0, 0].set(tbl[0, 0] + (1e-30 * s).astype(tbl.dtype))
            return tbl, tot + s
        _, tot = jax.lax.fori_loop(0, k, body, (tbl, jnp.float32(0)))
        return tot

    for tag, idx in (("blocksort", idx_block), ("sorted", idx_sorted),
                     ("random", idx_random), ("seq", idx_seq)):
        idxj = jnp.asarray(idx)
        t1 = timeit(lambda: float(chain(table, idxj, k=1)), tag=f"{tag} k=1")
        t9 = timeit(lambda: float(chain(table, idxj, k=9)), tag=f"{tag} k=9")
        per = (t9 - t1) / 8
        print(f"  => {tag}: {per * 1e3:.3f} ms ({per / E * 1e9:.2f} ns/row)",
              flush=True)


if __name__ == "__main__":
    main()
