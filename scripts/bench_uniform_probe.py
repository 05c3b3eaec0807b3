#!/usr/bin/env python
"""Uniform-graph step decomposition AFTER the round-3 changes: the step
dropped 105 -> 64.7 ms when the aligned pack + mono scatter replaced the
flat kernel, i.e. the per-edge gather can no longer be running at the
11.6 ns/row engine rate (8.02M rows would alone be 93 ms).  Measure:

  agg      — full aggregate_onehot (einsum + gather + mono scatter)
  gather   — table[gather_idx] alone (materialized table)
  fusedg   — einsum + gather (no scatter): does XLA fuse the producer?
  scatter  — mono scatter alone on precomputed messages
  einsum   — tnf table materialization alone

Run ON THE TPU: python -u scripts/bench_uniform_probe.py
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
from ggnn_tpu.models import ModelConfig, init_params
from ggnn_tpu.ops.scatter_pallas import (aggregate_onehot,
                                         build_dst_block_layout)
from ggnn_tpu.ops.window_pallas import window_block_spmm_mono

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


def diff_chain(tag, chain, *args):
    try:
        t1 = timeit(lambda: float(chain(*args, k=1)), tag=f"{tag} k=1")
        t9 = timeit(lambda: float(chain(*args, k=9)), tag=f"{tag} k=9")
    except Exception as e:
        print(f"  => {tag} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None
    per = (t9 - t1) / 8
    print(f"  => {tag}: {per * 1e3:.3f} ms", flush=True)
    return per


def main():
    batch = synthetic_batch(262_144, 4_000_000, T, annotation_dim=8, seed=0,
                            node_mult=128)
    N = batch.spec.n_pad
    cfg = ModelConfig(state_dim=D, annotation_dim=8, n_edge_types=T,
                      compute_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(1), cfg)
    msg_w = params["prop"]["msg_w"].astype(jnp.bfloat16)
    msg_b = params["prop"]["msg_b"].astype(jnp.bfloat16)
    h0 = jax.random.normal(jax.random.PRNGKey(2), (N, D), dtype=jnp.float32)
    lay = build_dst_block_layout(batch.edge_src, batch.edge_dst,
                                 batch.edge_type, batch.edge_mask, N,
                                 tile_e=2048, n_message_types=T2,
                                 edge_align=16).to_device()
    arrs = lay.arrays
    E_pack = arrs["gather_idx"].shape[0]
    print(f"E_pack = {E_pack}", flush=True)
    table0 = jax.random.normal(jax.random.PRNGKey(3), (T2 * N, D),
                               dtype=jnp.bfloat16)
    msgs0 = jax.random.normal(jax.random.PRNGKey(4), (E_pack, D),
                              dtype=jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("k",))
    def agg_chain(h, lay, k):
        def body(i, carry):
            h, tot = carry
            out = aggregate_onehot(h.astype(jnp.bfloat16), lay, msg_w,
                                   msg_b, interpret=False)
            s = out[0, 0]
            h = h.at[0, 0].set(h[0, 0] + 1e-30 * s)
            return h, tot + s
        _, tot = jax.lax.fori_loop(0, k, body, (h, jnp.float32(0)))
        return tot

    @functools.partial(jax.jit, static_argnames=("k",))
    def gather_chain(tbl, arrs, k):
        def body(i, carry):
            tbl, tot = carry
            msgs = tbl[arrs["gather_idx"]]
            s = jnp.sum(msgs[::65536, 0].astype(jnp.float32))
            tbl = tbl.at[0, 0].set(tbl[0, 0] + (1e-30 * s).astype(tbl.dtype))
            return tbl, tot + s
        _, tot = jax.lax.fori_loop(0, k, body, (tbl, jnp.float32(0)))
        return tot

    @functools.partial(jax.jit, static_argnames=("k",))
    def fusedg_chain(h, arrs, k):
        def body(i, carry):
            h, tot = carry
            hb = h.astype(jnp.bfloat16)
            t = jnp.einsum("nd,tdf->tnf", hb, msg_w,
                           preferred_element_type=jnp.float32) \
                + msg_b[:, None, :]
            tbl = t.reshape(-1, D).astype(jnp.bfloat16)
            msgs = tbl[arrs["gather_idx"]]
            s = jnp.sum(msgs[::65536, 0].astype(jnp.float32))
            h = h.at[0, 0].set(h[0, 0] + 1e-30 * s)
            return h, tot + s
        _, tot = jax.lax.fori_loop(0, k, body, (h, jnp.float32(0)))
        return tot

    @functools.partial(jax.jit, static_argnames=("k",))
    def scatter_chain(msgs, arrs, k):
        def body(i, carry):
            msgs, tot = carry
            out = window_block_spmm_mono(
                msgs, arrs["onehot"], arrs["tile_start"],
                arrs["block_of_tile"], arrs["tile_msg_off"],
                n_blocks=lay.n_blocks, window=lay.tile_e, win_stride=16,
                out_rows=128)
            s = out[0, 0]
            msgs = msgs.at[0, 0].set(msgs[0, 0]
                                     + (1e-30 * s).astype(msgs.dtype))
            return msgs, tot + s
        _, tot = jax.lax.fori_loop(0, k, body, (msgs, jnp.float32(0)))
        return tot

    @functools.partial(jax.jit, static_argnames=("k",))
    def einsum_chain(h, k):
        def body(i, carry):
            h, tot = carry
            hb = h.astype(jnp.bfloat16)
            t = jnp.einsum("nd,tdf->tnf", hb, msg_w,
                           preferred_element_type=jnp.float32) \
                + msg_b[:, None, :]
            tbl = t.reshape(-1, D).astype(jnp.bfloat16)
            s = tbl[0, 0].astype(jnp.float32)
            h = h.at[0, 0].set(h[0, 0] + 1e-30 * s)
            return h, tot + s
        _, tot = jax.lax.fori_loop(0, k, body, (h, jnp.float32(0)))
        return tot

    diff_chain("agg", agg_chain, h0, lay)
    diff_chain("gather", gather_chain, table0, arrs)
    diff_chain("fusedg", fusedg_chain, h0, arrs)
    diff_chain("scatter", scatter_chain, msgs0, arrs)
    diff_chain("einsum", einsum_chain, h0)


if __name__ == "__main__":
    main()
