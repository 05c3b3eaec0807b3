#!/usr/bin/env python
"""Isolate the windowed block-CSR kernel's per-tile cost on the real chip.

The community bench (512 communities, p_intra=0.95, W=512) measured
~2.1 us/tile where DMA bytes predict 0.23 us.  This probes, with chained
K=9 vs K=1 differencing (fetch roundtrip cancels):
  - the windowed kernel alone, nbuf/n_progs variants,
  - auto-pipelined (dynamic index map) vs manual ring,
  - full aggregate_window (einsum + kernel + spill).

Run ON THE TPU: python -u scripts/bench_window_probe.py > /tmp/winprobe.txt
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from ggnn_tpu.data.synthetic import synthetic_batch
from ggnn_tpu.ops import window_pallas as wp


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
    D, W = 128, 512
    batch = synthetic_batch(262_144, 4_000_000, 8, annotation_dim=8, seed=0,
                            node_mult=128, n_communities=512, p_intra=0.95)
    lay = wp.build_window_layout(batch.edge_src, batch.edge_dst,
                                 batch.edge_type, batch.edge_mask,
                                 batch.spec.n_pad, window=W)
    print(f"stats: {lay.stats}", flush=True)
    a = lay.arrays
    R = 16 * batch.spec.n_pad
    table = jax.random.normal(jax.random.PRNGKey(0), (R, D),
                              dtype=jnp.bfloat16)
    n_tiles = lay.n_tiles

    def chain_factory(kernel_call):
        # layout arrays flow through jit ARGUMENTS (closure constants bake
        # gigabytes into the compile payload — the remote-compile trap)
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(table, arrs, k):
            def body(i, carry):
                tbl, tot = carry
                out = kernel_call(tbl, arrs)
                s = out[0, 0]
                tbl = tbl.at[0, 0].set(tbl[0, 0]
                                       + (1e-30 * s).astype(tbl.dtype))
                return tbl, tot + s
            _, tot = jax.lax.fori_loop(0, k, body, (table, jnp.float32(0)))
            return tot
        return chain

    def diff(tag, kernel_call):
        ch = chain_factory(kernel_call)
        t1 = timeit(lambda: float(ch(table, a, k=1)), tag=f"{tag} k=1")
        t9 = timeit(lambda: float(ch(table, a, k=9)), tag=f"{tag} k=9")
        per = (t9 - t1) / 8
        print(f"  => {tag}: {per * 1e3:.2f} ms "
              f"({per / n_tiles * 1e9:.0f} ns/tile)", flush=True)

    for n_progs, nbuf in ((1, 6), (1, 12), (8, 6), (16, 4)):
        diff(f"mono np={n_progs} nbuf={nbuf}",
             lambda tbl, arrs, n_progs=n_progs, nbuf=nbuf:
             wp.window_block_spmm_mono(
                 tbl, arrs["c_stream"], arrs["tile_start"],
                 arrs["block_of_tile"], arrs["win_of_tile"],
                 n_blocks=lay.n_blocks, window=W,
                 n_progs=n_progs, nbuf=nbuf))

    diff("auto-pipelined",
         lambda tbl, arrs: wp.window_block_spmm(
             tbl, arrs["c_stream"], arrs["tile_start"],
             arrs["block_of_tile"], arrs["win_of_tile"],
             n_blocks=lay.n_blocks, window=W))

    # full aggregation (einsum + kernel + spill path)
    from ggnn_tpu.models import ModelConfig, init_params
    cfg = ModelConfig(state_dim=D, annotation_dim=8, n_edge_types=8,
                      compute_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(1), cfg)
    h0 = jax.random.normal(jax.random.PRNGKey(2),
                           (batch.spec.n_pad, D)).astype(jnp.float32)
    msg_w = params["prop"]["msg_w"].astype(jnp.bfloat16)
    msg_b = params["prop"]["msg_b"].astype(jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("k",))
    def agg_chain(h, lay, k):
        def body(i, carry):
            h, tot = carry
            out = wp.aggregate_window(h.astype(jnp.bfloat16), lay, msg_w,
                                      msg_b, interpret=False)
            s = out[0, 0]
            h = h.at[0, 0].set(h[0, 0] + 1e-30 * s)
            return h, tot + s
        _, tot = jax.lax.fori_loop(0, k, body, (h, jnp.float32(0)))
        return tot

    t1 = timeit(lambda: float(agg_chain(h0, lay, k=1)), tag="aggregate k=1")
    t9 = timeit(lambda: float(agg_chain(h0, lay, k=9)), tag="aggregate k=9")
    print(f"  => full aggregate_window: {(t9 - t1) / 8 * 1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
