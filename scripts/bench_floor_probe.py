#!/usr/bin/env python
"""Measure the remote-fetch floor and the TRUE per-op costs.

The scatter-variant sweep showed every kernel structure lands at ~31-36 ms
— consistent with a fixed per-call cost (tunnel roundtrip on the scalar
fetch), not kernel time.  This probes:

1. the fetch floor itself (tiny jit + scalar fetch),
2. true scatter time: K chained kernel calls inside ONE jit (dependency
   via a 1e-30-scaled scalar so XLA cannot hoist), (K2-K1) differencing,
3. true gather+scatter time (the aggregation core minus the einsum),
4. true per-step propagate time (T=5 vs T=25 differencing),
5. gather cost model: per-ROW or per-BYTE?  same total bytes as (3) but
   half the rows at D=256.

Run ON THE TPU:  python -u scripts/bench_floor_probe.py > /tmp/floor.txt 2>&1
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
from ggnn_tpu.models import ModelConfig, init_params
from ggnn_tpu.models.ggnn import propagate
from ggnn_tpu.ops import scatter_pallas as sp


def timeit(fn, iters=8, warmup=2, tag=""):
    t0 = time.perf_counter()
    fn()
    compile_s = time.perf_counter() - t0
    for _ in range(warmup):
        fn()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{tag}: {best * 1e3:.2f} ms  (compile {compile_s:.0f}s)",
          flush=True)
    return best


def main():
    print(f"device: {jax.devices()[0]}", flush=True)

    # -- 1. fetch floor ----------------------------------------------------
    @jax.jit
    def tiny(x):
        return jnp.sum(x)

    xsmall = jnp.ones((8,), jnp.float32)
    floor = timeit(lambda: float(tiny(xsmall)), iters=20, tag="fetch floor")

    # -- shared data: 262K nodes / 8M directed edges / D=128 ---------------
    D = 128
    batch = synthetic_batch(262_144, 4_000_000, 8, annotation_dim=8, seed=0,
                            node_mult=128)
    n_edges = int(batch.edge_mask.sum())
    lay = sp.build_dst_block_layout(
        batch.edge_src, batch.edge_dst, batch.edge_type, batch.edge_mask,
        batch.spec.n_pad, tile_e=2048)
    e_pack = lay.gather_idx.shape[0]
    dev = lay.to_device()
    arrs = dev.arrays
    msgs = jax.random.normal(jax.random.PRNGKey(0), (e_pack, D),
                             dtype=jnp.bfloat16)
    n_rows = 16 * batch.spec.n_pad  # type·N table rows
    table = jax.random.normal(jax.random.PRNGKey(1), (n_rows, D),
                              dtype=jnp.bfloat16)

    # -- 2. chained scatter -------------------------------------------------
    @functools.partial(jax.jit, static_argnames=("k",))
    def scat_chain(msgs, oh, ts, bt, k):
        def body(i, carry):
            m, tot = carry
            out = sp.onehot_segment_scatter_flat(
                m, oh, ts, bt, n_blocks=dev.n_blocks, tile_e=2048)
            s = out[0, 0]
            m = m.at[0, 0].set(m[0, 0] + (1e-30 * s).astype(m.dtype))
            return m, tot + s
        _, tot = jax.lax.fori_loop(0, k, body, (msgs, jnp.float32(0)))
        return tot

    t1 = timeit(lambda: float(scat_chain(
        msgs, arrs["onehot"], arrs["tile_start"], arrs["block_of_tile"], k=1)),
        tag="scatter k=1")
    t9 = timeit(lambda: float(scat_chain(
        msgs, arrs["onehot"], arrs["tile_start"], arrs["block_of_tile"], k=9)),
        tag="scatter k=9")
    print(f"  => true scatter: {(t9 - t1) / 8 * 1e3:.2f} ms", flush=True)

    # -- 3. chained gather+scatter ------------------------------------------
    @functools.partial(jax.jit, static_argnames=("k",))
    def gs_chain(table, gi, oh, ts, bt, k):
        def body(i, carry):
            tbl, tot = carry
            m = tbl[gi]
            out = sp.onehot_segment_scatter_flat(
                m, oh, ts, bt, n_blocks=dev.n_blocks, tile_e=2048)
            s = out[0, 0]
            tbl = tbl.at[0, 0].set(tbl[0, 0] + (1e-30 * s).astype(tbl.dtype))
            return tbl, tot + s
        _, tot = jax.lax.fori_loop(0, k, body, (table, jnp.float32(0)))
        return tot

    g1 = timeit(lambda: float(gs_chain(
        table, arrs["gather_idx"], arrs["onehot"], arrs["tile_start"],
        arrs["block_of_tile"], k=1)), tag="gather+scatter k=1")
    g9 = timeit(lambda: float(gs_chain(
        table, arrs["gather_idx"], arrs["onehot"], arrs["tile_start"],
        arrs["block_of_tile"], k=9)), tag="gather+scatter k=9")
    gs = (g9 - g1) / 8
    print(f"  => true gather+scatter: {gs * 1e3:.2f} ms "
          f"({e_pack / gs / 1e6:.0f} M rows/s, "
          f"{e_pack * 1e9 * 2 * D / gs / 1e9:.0f} GB/s... per-row "
          f"{gs / e_pack * 1e9:.2f} ns)", flush=True)

    # -- 4. true per-step propagate (onehot backend) -------------------------
    cfgs = {t: ModelConfig(state_dim=D, annotation_dim=8, n_edge_types=8,
                           n_steps=t, backend="onehot",
                           compute_dtype="bfloat16") for t in (5, 25)}
    params = init_params(jax.random.PRNGKey(0), cfgs[5])

    @functools.partial(jax.jit, static_argnames=("t",))
    def prop(prop_params, ann, lay_dev, t):
        h = propagate(prop_params, cfgs[t], ann, None, None, None, None,
                      scatter_layout=lay_dev)
        return jnp.sum(h)

    ann = jnp.asarray(batch.annotations)
    p5 = timeit(lambda: float(prop(params["prop"], ann, dev, t=5)),
                tag="propagate T=5")
    p25 = timeit(lambda: float(prop(params["prop"], ann, dev, t=25)),
                 tag="propagate T=25")
    step = (p25 - p5) / 20
    print(f"  => true per-step: {step * 1e3:.2f} ms "
          f"({n_edges / step / 1e6:.1f} M edges/s steady-state)", flush=True)

    # -- 5. per-row vs per-byte: D=256, half the edges -----------------------
    D2 = 256
    batch2 = synthetic_batch(262_144, 2_000_000, 8, annotation_dim=8, seed=1,
                             node_mult=128)
    lay2 = sp.build_dst_block_layout(
        batch2.edge_src, batch2.edge_dst, batch2.edge_type, batch2.edge_mask,
        batch2.spec.n_pad, tile_e=2048)
    dev2 = lay2.to_device()
    arrs2 = dev2.arrays
    e_pack2 = lay2.gather_idx.shape[0]
    table2 = jax.random.normal(jax.random.PRNGKey(2), (n_rows, D2),
                               dtype=jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("k",))
    def gs2_chain(table, gi, oh, ts, bt, k):
        def body(i, carry):
            tbl, tot = carry
            m = tbl[gi]
            out = sp.onehot_segment_scatter_flat(
                m, oh, ts, bt, n_blocks=dev2.n_blocks, tile_e=2048)
            s = out[0, 0]
            tbl = tbl.at[0, 0].set(tbl[0, 0] + (1e-30 * s).astype(tbl.dtype))
            return tbl, tot + s
        _, tot = jax.lax.fori_loop(0, k, body, (table, jnp.float32(0)))
        return tot

    h1 = timeit(lambda: float(gs2_chain(
        table2, arrs2["gather_idx"], arrs2["onehot"], arrs2["tile_start"],
        arrs2["block_of_tile"], k=1)), tag="gather+scatter D=256 half-E k=1")
    h9 = timeit(lambda: float(gs2_chain(
        table2, arrs2["gather_idx"], arrs2["onehot"], arrs2["tile_start"],
        arrs2["block_of_tile"], k=9)), tag="gather+scatter D=256 half-E k=9")
    gs2 = (h9 - h1) / 8
    print(f"  => D=256 half-E: {gs2 * 1e3:.2f} ms "
          f"(per-row {gs2 / e_pack2 * 1e9:.2f} ns; same bytes as D=128 case "
          f"— if ~half the time, gather cost is per-ROW)", flush=True)


if __name__ == "__main__":
    main()
