#!/usr/bin/env python
"""One-hot (uniform-graph) backward decomposition, chained differencing.

Passes: vg (agg fwd+bwd), fwd, ggather (da[g_gather_idx]), yscatter
(the grad one-hot scatter alone), einsums (dh/dW from a fixed Y).
Run ON THE TPU: python -u scripts/bench_onehot_bwd_probe.py [passes]
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
from ggnn_tpu.ops import scatter_pallas as sp

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
    which = set(sys.argv[1:]) or {"vg", "fwd", "ggather", "yscatter",
                                  "einsums"}
    batch = synthetic_batch(262_144, 4_000_000, T, annotation_dim=8, seed=0,
                            node_mult=128)
    N = batch.spec.n_pad
    cfg = ModelConfig(state_dim=D, annotation_dim=8, n_edge_types=T,
                      compute_dtype="bfloat16", backend="onehot")
    params = init_params(jax.random.PRNGKey(1), cfg)
    msg_w = params["prop"]["msg_w"].astype(jnp.bfloat16)
    msg_b = params["prop"]["msg_b"].astype(jnp.bfloat16)
    h0 = jax.random.normal(jax.random.PRNGKey(2), (N, D), dtype=jnp.float32)
    da0 = jax.random.normal(jax.random.PRNGKey(3), (N, D),
                            dtype=jnp.bfloat16)
    lay = sp.build_dst_block_layout(
        batch.edge_src, batch.edge_dst, batch.edge_type, batch.edge_mask,
        N, tile_e=2048, with_grad=True, n_message_types=T2,
        row_order="block", edge_align=16).to_device()
    arrs = lay.arrays
    gm = lay.grad_meta
    print(f"grad meta: blocks={gm[0]} max_tiles={gm[1]} tile_e={gm[2]} "
          f"onehot={gm[3]} align={gm[4] if len(gm) > 4 else None}",
          flush=True)
    print(f"g_gather rows: {arrs['g_gather_idx'].shape[0]} "
          f"(real {int(batch.edge_mask.sum())})", flush=True)

    if "vg" in which:
        @functools.partial(jax.jit, static_argnames=("k",))
        def vg_chain(h, lay, k):
            def body(i, carry):
                h, tot = carry

                def loss(hh):
                    a = sp.aggregate_onehot(hh.astype(jnp.bfloat16), lay,
                                            msg_w, msg_b)
                    return jnp.sum(a * a)

                l, g = jax.value_and_grad(loss)(h)
                h = h + 1e-30 * g
                return h, tot + l
            _, tot = jax.lax.fori_loop(0, k, body, (h, jnp.float32(0)))
            return tot

        diff_chain("vg onehot agg", vg_chain, h0, lay)

    if "fwd" in which:
        @functools.partial(jax.jit, static_argnames=("k",))
        def fwd_chain(h, lay, k):
            def body(i, carry):
                h, tot = carry
                a = sp.aggregate_onehot(h.astype(jnp.bfloat16), lay, msg_w,
                                        msg_b)
                s = jnp.sum(a[0, :1])
                h = h + 1e-30 * s
                return h, tot + s
            _, tot = jax.lax.fori_loop(0, k, body, (h, jnp.float32(0)))
            return tot

        diff_chain("fwd onehot agg", fwd_chain, h0, lay)

    if "ggather" in which:
        @functools.partial(jax.jit, static_argnames=("k",))
        def gg_chain(da, arrs, k):
            def body(i, carry):
                da, tot = carry
                G = da[arrs["g_gather_idx"]]
                s = G[0, 0].astype(jnp.float32) + jnp.sum(G[-1, :1])
                da = da.at[0, 0].set(da[0, 0]
                                     + (1e-30 * s).astype(da.dtype))
                return da, tot + s
            _, tot = jax.lax.fori_loop(0, k, body, (da, jnp.float32(0)))
            return tot

        diff_chain("g gather", gg_chain, da0, arrs)

    if "yscatter" in which:
        @functools.partial(jax.jit, static_argnames=("k",))
        def ys_chain(da, arrs, k):
            def body(i, carry):
                da, tot = carry
                Y = sp._typed_reverse_scatter(lay.meta, False, arrs, da,
                                              T2, N, D,
                                              out_dtype=jnp.bfloat16)
                s = Y[0, 0].astype(jnp.float32)
                da = da.at[0, 0].set(da[0, 0]
                                     + (1e-30 * s).astype(da.dtype))
                return da, tot + s
            _, tot = jax.lax.fori_loop(0, k, body, (da, jnp.float32(0)))
            return tot

        diff_chain("reverse scatter (gather+onehot)", ys_chain, da0, arrs)

    if "bwdonly" in which:
        hb = h0.astype(jnp.bfloat16)

        @functools.partial(jax.jit, static_argnames=("k",))
        def bo_chain(da, hb, arrs, k):
            def body(i, carry):
                da, tot = carry
                _, dh, dW, db = sp._aggregate_bwd(
                    lay.meta, False, (arrs, hb, msg_w), da)
                s = (dh[0, 0].astype(jnp.float32)
                     + dW[0, 0, 0].astype(jnp.float32)
                     + db[0, 0].astype(jnp.float32))
                da = da.at[0, 0].set(da[0, 0]
                                     + (1e-30 * s).astype(da.dtype))
                return da, tot + s
            _, tot = jax.lax.fori_loop(0, k, body, (da, jnp.float32(0)))
            return tot

        diff_chain("bwd only (full _aggregate_bwd)", bo_chain, da0, hb,
                   arrs)

    if "manualvg" in which:
        hb = h0.astype(jnp.bfloat16)

        @functools.partial(jax.jit, static_argnames=("k",))
        def mv_chain(h, hb, lay, k):
            def body(i, carry):
                h, tot = carry
                a = sp.aggregate_onehot(h.astype(jnp.bfloat16), lay, msg_w,
                                        msg_b)
                da = 2.0 * a
                _, dh, dW, db = sp._aggregate_bwd(
                    lay.meta, False, (lay.arrays, hb, msg_w), da)
                s = (jnp.sum(a[0, :1]) + dh[0, 0].astype(jnp.float32)
                     + dW[0, 0, 0].astype(jnp.float32))
                h = h + 1e-30 * s
                return h, tot + s
            _, tot = jax.lax.fori_loop(0, k, body, (h, jnp.float32(0)))
            return tot

        diff_chain("manual fwd+bwd composition", mv_chain, h0, hb, lay)

    if "bwdf32" in which:
        hb = h0.astype(jnp.bfloat16)
        daf = jax.random.normal(jax.random.PRNGKey(6), (N, D),
                                dtype=jnp.float32)

        @functools.partial(jax.jit, static_argnames=("k",))
        def bf_chain(da, hb, arrs, k):
            def body(i, carry):
                da, tot = carry
                _, dh, dW, db = sp._aggregate_bwd(
                    lay.meta, False, (arrs, hb, msg_w), da)
                s = (dh[0, 0].astype(jnp.float32)
                     + dW[0, 0, 0].astype(jnp.float32))
                da = da.at[0, 0].set(da[0, 0] + 1e-30 * s)
                return da, tot + s
            _, tot = jax.lax.fori_loop(0, k, body, (da, jnp.float32(0)))
            return tot

        diff_chain("bwd only f32 da", bf_chain, daf, hb, arrs)

    if "einsums" in which:
        Y0 = jnp.zeros((T2 * N, D), jnp.bfloat16)

        @functools.partial(jax.jit, static_argnames=("k",))
        def ein_chain(h, Y0, k):
            def body(i, carry):
                Y, tot = carry
                Yb = Y.reshape(N // 128, T2, 128, D)
                dh = jnp.einsum("btsf,tdf->bsd", Yb, msg_w,
                                preferred_element_type=jnp.float32)
                dW = jnp.einsum(
                    "bsd,btsf->tdf",
                    h.astype(jnp.bfloat16).reshape(N // 128, 128, D),
                    Yb, preferred_element_type=jnp.float32)
                s = dh[0, 0, 0] + dW[0, 0, 0]
                Y = Y.at[0, 0].set(Y[0, 0] + (1e-30 * s).astype(Y.dtype))
                return Y, tot + s
            _, tot = jax.lax.fori_loop(0, k, body, (Y0, jnp.float32(0)))
            return tot

        diff_chain("bwd einsums", ein_chain, h0, Y0)


if __name__ == "__main__":
    main()
