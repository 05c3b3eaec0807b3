#!/usr/bin/env python
"""Sweep the one-hot scatter kernel variants on the real chip.

Round-2 lead (CLAUDE.md): the production flat kernel measures ~30 ms for
8M edges at D=128 while the HBM-bandwidth floor is ~5 ms — a fixed
~3-7 us/program grid cost dominates.  This sweeps tile sizes and the new
monolithic-streaming kernel (grid machinery runs once; inner DMA ring).

Run ON THE TPU (one job at a time through the tunnel):
  python -u scripts/bench_scatter_variants.py > /tmp/scatter_sweep.txt 2>&1
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from ggnn_tpu.data.synthetic import synthetic_batch
from ggnn_tpu.ops import scatter_pallas as sp


def timeit(fn, iters=6, warmup=2):
    t0 = time.perf_counter()
    fn()  # compile
    compile_s = time.perf_counter() - t0
    for _ in range(warmup):
        fn()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=262_144)
    ap.add_argument("--edges", type=int, default=4_000_000)
    ap.add_argument("--types", type=int, default=8)
    ap.add_argument("--dim", type=int, default=128)
    args = ap.parse_args()

    print(f"device: {jax.devices()[0]}", flush=True)
    batch = synthetic_batch(args.nodes, args.edges, args.types,
                            annotation_dim=8, seed=0, node_mult=128)
    n_edges = int(batch.edge_mask.sum())
    D = args.dim
    print(f"directed edges: {n_edges}", flush=True)

    plan = {
        1024: [("flat", {}), ("mono", dict(n_progs=1, nbuf=8))],
        2048: [("flat", {}), ("loopT", {}), ("mono", dict(n_progs=1, nbuf=4)),
               ("mono", dict(n_progs=8, nbuf=4))],
        4096: [("flat", {}), ("mono", dict(n_progs=1, nbuf=4))],
    }

    for tile_e, variants in plan.items():
        lay = sp.build_dst_block_layout(
            batch.edge_src, batch.edge_dst, batch.edge_type, batch.edge_mask,
            batch.spec.n_pad, tile_e=tile_e)
        e_pack = lay.gather_idx.shape[0]
        print(f"\n== tile_e={tile_e}: E_pack={e_pack} "
              f"({e_pack / n_edges:.2f}x pad), tiles={e_pack // tile_e}, "
              f"stream {(e_pack * (128 + 2 * D)) / 1e9:.2f} GB ==", flush=True)
        dev = lay.to_device()
        arrs = dev.arrays
        msgs = jax.random.normal(jax.random.PRNGKey(0), (e_pack, D),
                                 dtype=jnp.bfloat16)

        for name, kw in variants:
            if name == "flat":
                def call(msgs=msgs, arrs=arrs, dev=dev, tile_e=tile_e):
                    return sp.onehot_segment_scatter_flat(
                        msgs, arrs["onehot"], arrs["tile_start"],
                        arrs["block_of_tile"], n_blocks=dev.n_blocks,
                        tile_e=tile_e)
            elif name == "loopT":
                def call(msgs=msgs, arrs=arrs, dev=dev, tile_e=tile_e):
                    return sp.onehot_segment_scatter_loopT(
                        msgs, arrs["onehot"], arrs["tile_start"],
                        n_blocks=dev.n_blocks, tile_e=tile_e)
            else:
                def call(msgs=msgs, arrs=arrs, dev=dev, tile_e=tile_e, kw=kw):
                    return sp.onehot_segment_scatter_mono(
                        msgs, arrs["onehot"], arrs["tile_start"],
                        arrs["block_of_tile"], n_blocks=dev.n_blocks,
                        tile_e=tile_e, **kw)

            def step(call=call):
                # scalar fetch: block_until_ready does not sync the tunnel
                return float(jnp.sum(call()))

            try:
                best, compile_s = timeit(step)
                eff_gbs = e_pack * (128 + 2 * D) / best / 1e9
                print(f"{name} {kw or ''} tile_e={tile_e}: {best * 1e3:.2f} ms"
                      f"  ({n_edges / best / 1e6:.1f} M edges/s,"
                      f" {eff_gbs:.0f} GB/s eff, compile {compile_s:.0f}s)",
                      flush=True)
            except Exception as e:
                print(f"{name} {kw or ''} tile_e={tile_e}: FAILED "
                      f"{type(e).__name__}: {e}", flush=True)

        del dev, arrs, msgs, lay
        gc.collect()


if __name__ == "__main__":
    main()
