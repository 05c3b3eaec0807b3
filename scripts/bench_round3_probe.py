#!/usr/bin/env python
"""Round-3 probes on the real chip (chained K=9 vs K=1 differencing so the
fixed tunnel-fetch roundtrip cancels — docs/DESIGN.md measurement rule):

  1. mono window kernel, unpacked vs int4-packed count stream
     (community graph, block_rows=512, W=512 — the headline config);
  2. the node-transform einsum: current `einsum ntf → astype(bf16)` form
     (materializes an [N,T2,D] f32 intermediate) vs a flat
     `h @ W_cat → bf16` matmul whose convert can fuse into the epilogue;
  3. GRU update cost in isolation (decides whether a fused-GRU kernel
     epilogue pays);
  4. full aggregate_window with packed layout.

Run ON THE TPU: python -u scripts/bench_round3_probe.py > /tmp/r3probe.txt
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


def diff_chain(tag, chain, *args):
    try:
        t1 = timeit(lambda: float(chain(*args, k=1)), tag=f"{tag} k=1")
        t9 = timeit(lambda: float(chain(*args, k=9)), tag=f"{tag} k=9")
    except Exception as e:  # keep probing other sections
        print(f"  => {tag} FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)
        return None
    per = (t9 - t1) / 8
    print(f"  => {tag}: {per * 1e3:.3f} ms", flush=True)
    return per


def main():
    D, W, BR, T = 128, 512, 512, 8
    T2 = 2 * T
    batch = synthetic_batch(262_144, 4_000_000, T, annotation_dim=8, seed=0,
                            node_mult=128, n_communities=512, p_intra=0.95)
    N = batch.spec.n_pad
    lays = {}
    for packed in (False, True):
        lays[packed] = wp.build_window_layout(
            batch.edge_src, batch.edge_dst, batch.edge_type, batch.edge_mask,
            N, window=W, n_message_types=T2, block_rows=BR,
            pack_counts=packed)
        print(f"packed={packed}: {lays[packed].stats}", flush=True)
    n_tiles = lays[False].n_tiles

    R = T2 * N
    table = jax.random.normal(jax.random.PRNGKey(0), (R, D),
                              dtype=jnp.bfloat16)

    # ---- 1. mono kernel, unpacked vs packed -------------------------------
    @functools.partial(jax.jit, static_argnames=("k", "packed"))
    def kchain(table, arrs, k, packed):
        def body(i, carry):
            tbl, tot = carry
            out = wp.window_block_spmm_mono(
                tbl, arrs["c_stream"], arrs["tile_start"],
                arrs["block_of_tile"], arrs["win_of_tile"],
                n_blocks=lays[False].n_blocks, window=W, out_rows=BR,
                packed=packed)
            s = out[0, 0]
            tbl = tbl.at[0, 0].set(tbl[0, 0] + (1e-30 * s).astype(tbl.dtype))
            return tbl, tot + s
        _, tot = jax.lax.fori_loop(0, k, body, (table, jnp.float32(0)))
        return tot

    for packed in (False, True):
        per = diff_chain(f"mono packed={packed}",
                         functools.partial(kchain, packed=packed),
                         table, lays[packed].arrays)
        if per is not None:
            print(f"     {per / n_tiles * 1e9:.0f} ns/tile", flush=True)

    # ---- 2. einsum forms --------------------------------------------------
    from ggnn_tpu.models import ModelConfig, init_params
    cfg = ModelConfig(state_dim=D, annotation_dim=8, n_edge_types=T,
                      compute_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(1), cfg)
    msg_w = params["prop"]["msg_w"].astype(jnp.bfloat16)
    msg_b = params["prop"]["msg_b"].astype(jnp.bfloat16)
    w_cat = jnp.transpose(msg_w, (1, 0, 2)).reshape(D, T2 * D)
    b_cat = msg_b.reshape(T2 * D)
    h0 = jax.random.normal(jax.random.PRNGKey(2), (N, D), dtype=jnp.float32)

    def table_cur(hb):
        t = jnp.einsum("nd,tdf->ntf", hb, msg_w,
                       preferred_element_type=jnp.float32) + msg_b[None, :, :]
        return t.reshape(-1, D).astype(jnp.bfloat16)

    def table_flat(hb):
        t = jnp.dot(hb, w_cat, preferred_element_type=jnp.float32) + b_cat
        return t.astype(jnp.bfloat16).reshape(-1, D)

    @functools.partial(jax.jit, static_argnames=("k", "form"))
    def echain(h, k, form):
        fn = table_cur if form == "cur" else table_flat
        def body(i, carry):
            h, tot = carry
            tbl = fn(h.astype(jnp.bfloat16))
            s = tbl[0, 0].astype(jnp.float32)
            h = h.at[0, 0].set(h[0, 0] + 1e-30 * s)
            return h, tot + s
        _, tot = jax.lax.fori_loop(0, k, body, (h, jnp.float32(0)))
        return tot

    for form in ("cur", "flat"):
        diff_chain(f"table einsum [{form}]",
                   functools.partial(echain, form=form), h0)

    # ---- 3. GRU update in isolation ---------------------------------------
    from ggnn_tpu.models.ggnn import fuse_gru, gru_update
    fused = fuse_gru(params["prop"]["gru"])
    a0 = jax.random.normal(jax.random.PRNGKey(3), (N, D), dtype=jnp.float32)

    @functools.partial(jax.jit, static_argnames=("k",))
    def gchain(h, a, k):
        def body(i, carry):
            h, tot = carry
            h = gru_update(params["prop"]["gru"], h, a, fused)
            return h, tot + h[0, 0]
        _, tot = jax.lax.fori_loop(0, k, body, (h, jnp.float32(0)))
        return tot

    diff_chain("gru_update", gchain, h0, a0)

    # ---- 4. full packed aggregation ---------------------------------------
    @functools.partial(jax.jit, static_argnames=("k",))
    def achain(h, lay, k):
        def body(i, carry):
            h, tot = carry
            out = wp.aggregate_window(h.astype(jnp.bfloat16), lay, msg_w,
                                      msg_b, interpret=False)
            s = out[0, 0]
            h = h.at[0, 0].set(h[0, 0] + 1e-30 * s)
            return h, tot + s
        _, tot = jax.lax.fori_loop(0, k, body, (h, jnp.float32(0)))
        return tot

    for packed in (False, True):
        diff_chain(f"aggregate_window packed={packed}", achain, h0,
                   lays[packed])


if __name__ == "__main__":
    main()
