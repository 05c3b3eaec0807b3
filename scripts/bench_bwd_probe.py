#!/usr/bin/env python
"""Training-backward decomposition (community config, with_grad layout).

Chains (pass names as argv to select; default all — run one per process
to isolate OOM):

  step     — one full train step (fwd+bwd+Adam) via the model path
  vg       — value_and_grad of sum(a^2) on ONE aggregation
  fwdagg   — the same aggregation forward-only
  ykernel  — transposed window kernel Y = C^T · da alone (compact stream)
  gather   — da row-gather for the spilled edges alone
  spillbwd — the production compact spill backward: da row-gather +
             segment_sum into [U, D] + sorted unique scatter-add into Y
  einsums  — dh/dW/db block-major einsums from a fixed bf16 Y
  grubwd   — jax.grad through gru_update alone

All layouts flow through jit ARGUMENTS (DeviceWindowLayout is a
registered pytree) — closure capture blows the remote-compile payload
(CLAUDE.md HTTP 413).  Run ON THE TPU: python -u scripts/bench_bwd_probe.py
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
from ggnn_tpu.models.ggnn import fuse_gru, gru_update, propagate
from ggnn_tpu.ops import window_pallas as wp

D, W, BR, T = 128, 512, 512, 8
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
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(a[2:].split("=", 1) for a in sys.argv[1:]
                if a.startswith("--"))
    nodes = int(opts.get("nodes", 262_144))
    edges = int(opts.get("edges", 4_000_000))
    comms = int(opts.get("communities", 512))
    which = set(argv) or {"step", "vg", "fwdagg", "ykernel",
                          "gather", "spillbwd", "dhscatter",
                          "segsum", "einsums", "grubwd"}
    batch = synthetic_batch(nodes, edges, T, annotation_dim=8, seed=0,
                            node_mult=128, n_communities=comms,
                            p_intra=0.95)
    N = batch.spec.n_pad
    R = T2 * N
    cfg = ModelConfig(state_dim=D, annotation_dim=8, n_edge_types=T,
                      compute_dtype="bfloat16", backend="window")
    params = init_params(jax.random.PRNGKey(1), cfg)
    prop = params["prop"]
    msg_w = prop["msg_w"].astype(jnp.bfloat16)
    msg_b = prop["msg_b"].astype(jnp.bfloat16)
    h0 = jax.random.normal(jax.random.PRNGKey(2), (N, D), dtype=jnp.float32)
    da0 = jax.random.normal(jax.random.PRNGKey(3), (N, D),
                            dtype=jnp.bfloat16)
    lay = wp.build_window_layout(
        batch.edge_src, batch.edge_dst, batch.edge_type, batch.edge_mask,
        N, window=W, n_message_types=T2,
        block_rows=BR, with_grad=True, row_major="block")
    arrs = lay.arrays
    n_wins, n_gt = lay.grad_meta[:2]
    E_s = int(arrs["s_bwd_dst"].shape[0])
    U = int(arrs["s_bwd_src"].shape[0])
    sp_offs = lay.grad_meta[2]
    print(f"layout stats: {lay.stats}", flush=True)
    print(f"spilled real edges: {E_s}  bucket rows: {U}  "
          f"grad tiles: {n_gt}  fwd_stream_bwd: "
          f"{'ct_stream' not in arrs}", flush=True)

    if "step" in which:
        import optax
        optimizer = optax.adam(1e-3)
        opt_state0 = optimizer.init(prop)
        ann = jnp.asarray(batch.annotations)
        es, ed = jnp.asarray(batch.edge_src), jnp.asarray(batch.edge_dst)
        et, em = jnp.asarray(batch.edge_type), jnp.asarray(batch.edge_mask)

        @functools.partial(jax.jit, static_argnames=("k",))
        def step_chain(prop, opt_state, lay, k):
            def body(carry, _):
                prop, opt_state = carry

                def loss_fn(p):
                    h = propagate(p, cfg, ann, es, ed, et, em,
                                  scatter_layout=lay)
                    return jnp.sum(h * h)
                loss, grads = jax.value_and_grad(loss_fn)(prop)
                updates, opt_state = optimizer.update(grads, opt_state, prop)
                prop = optax.apply_updates(prop, updates)
                return (prop, opt_state), loss
            (prop, opt_state), losses = jax.lax.scan(
                body, (prop, opt_state), None, length=k)
            return losses[-1]

        per_step = diff_chain("train step", step_chain, prop, opt_state0,
                              lay)
        if per_step is not None:
            print(f"  per propagation step: "
                  f"{per_step / cfg.n_steps * 1e3:.2f} ms", flush=True)

    if "vg" in which:
        @functools.partial(jax.jit, static_argnames=("k",))
        def vg_chain(h, lay, k):
            def body(i, carry):
                h, tot = carry

                def loss(hh):
                    a = wp.aggregate_window(hh.astype(jnp.bfloat16), lay,
                                            msg_w, msg_b, interpret=False)
                    return jnp.sum(a * a)

                l, g = jax.value_and_grad(loss)(h)
                h = h + 1e-30 * g
                return h, tot + l
            _, tot = jax.lax.fori_loop(0, k, body, (h, jnp.float32(0)))
            return tot

        diff_chain("vg full agg", vg_chain, h0, lay)

    if "fwdagg" in which:
        @functools.partial(jax.jit, static_argnames=("k",))
        def fwd_chain(h, lay, k):
            def body(i, carry):
                h, tot = carry
                a = wp.aggregate_window(h.astype(jnp.bfloat16), lay, msg_w,
                                        msg_b, interpret=False)
                s = jnp.sum(a[0, :1])
                h = h + 1e-30 * s
                return h, tot + s
            _, tot = jax.lax.fori_loop(0, k, body, (h, jnp.float32(0)))
            return tot

        diff_chain("fwd agg", fwd_chain, h0, lay)

    if "ykernel" in which and "ct_stream" in arrs:
        @functools.partial(jax.jit, static_argnames=("k",))
        def yk_chain(da, arrs, k):
            da_pad = da.astype(jnp.bfloat16)

            def body(i, carry):
                da, tot = carry
                Y = wp.window_block_spmm_mono(
                    da, arrs["ct_stream"], arrs["gt_tile_start"],
                    arrs["gt_block_of_tile"], arrs["gt_win_of_tile"],
                    n_blocks=n_wins, window=BR, out_rows=W,
                    c_off=arrs["gt_c_off"], out_dtype=jnp.bfloat16)
                s = Y[0, 0].astype(jnp.float32)
                da = da.at[0, 0].set(da[0, 0]
                                     + (1e-30 * s).astype(da.dtype))
                return da, tot + s
            _, tot = jax.lax.fori_loop(0, k, body, (da_pad, jnp.float32(0)))
            return tot

        diff_chain("ykernel", yk_chain, da0, arrs)

    if "gather" in which:
        @functools.partial(jax.jit, static_argnames=("k",))
        def gather_chain(da, arrs, k):
            def body(i, carry):
                da, tot = carry
                G = da[arrs["s_bwd_dst"]]
                s = G[0, 0].astype(jnp.float32) + jnp.sum(G[-1, :1])
                da = da.at[0, 0].set(da[0, 0]
                                     + (1e-30 * s).astype(da.dtype))
                return da, tot + s
            _, tot = jax.lax.fori_loop(0, k, body, (da, jnp.float32(0)))
            return tot

        diff_chain("gather only", gather_chain, da0, arrs)

    if "spillbwd" in which:
        hb = h0.astype(jnp.bfloat16)

        sb_meta = lay.grad_meta[3] if len(lay.grad_meta) > 3 else None

        @functools.partial(jax.jit, static_argnames=("k",))
        def sb_chain(da, hb, arrs, k):
            def body(i, carry):
                da, tot = carry
                dh_sp, dW_sp = wp._spill_backward(arrs, sp_offs, sb_meta,
                                                  hb, da, msg_w, False)
                s = dh_sp[0, 0] + dW_sp[0, 0, 0]
                da = da.at[0, 0].set(da[0, 0]
                                     + (1e-30 * s).astype(da.dtype))
                return da, tot + s
            _, tot = jax.lax.fori_loop(0, k, body, (da, jnp.float32(0)))
            return tot

        diff_chain("spillbwd typed", sb_chain, da0, hb, arrs)

    if "dhscatter" in which:
        rows0 = jax.random.normal(jax.random.PRNGKey(5), (U, D),
                                  dtype=jnp.float32)

        @functools.partial(jax.jit, static_argnames=("k",))
        def dhs_chain(rows, arrs, k):
            def body(i, carry):
                rows, tot = carry
                dh_sp = jnp.zeros((N, D), jnp.float32).at[
                    arrs["s_bwd_src"]].add(rows)
                s = dh_sp[0, 0]
                rows = rows.at[0, 0].set(rows[0, 0] + 1e-30 * s)
                return rows, tot + s
            _, tot = jax.lax.fori_loop(0, k, body, (rows, jnp.float32(0)))
            return tot

        diff_chain("dh scatter", dhs_chain, rows0, arrs)

    if "segsum" in which and "s_bwd_seg" in arrs:
        # legacy probe: build_window_layout no longer emits s_bwd_seg (the
        # spill backward moved to s_bwd_dst/s_bwd_src buckets) — gate like
        # the ykernel probe's ct_stream
        @functools.partial(jax.jit, static_argnames=("k",))
        def ss_chain(da, arrs, k):
            def body(i, carry):
                da, tot = carry
                G = da[arrs["s_bwd_dst"]]
                Ysp = jax.ops.segment_sum(
                    G, arrs["s_bwd_seg"], num_segments=U,
                    indices_are_sorted=True).astype(jnp.bfloat16)
                s = Ysp[0, 0].astype(jnp.float32)
                da = da.at[0, 0].set(da[0, 0]
                                     + (1e-30 * s).astype(da.dtype))
                return da, tot + s
            _, tot = jax.lax.fori_loop(0, k, body, (da, jnp.float32(0)))
            return tot

        diff_chain("gather+segsum", ss_chain, da0, arrs)

    if "einsums" in which:
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
                db = jnp.sum(Yb, axis=(0, 2))
                s = dh[0, 0, 0] + dW[0, 0, 0] + db[0, 0]
                Y = Y.at[0, 0].set(Y[0, 0] + (1e-30 * s).astype(Y.dtype))
                return Y, tot + s
            _, tot = jax.lax.fori_loop(0, k, body, (Y0, jnp.float32(0)))
            return tot

        Y0 = jnp.zeros((R, D), jnp.bfloat16)
        diff_chain("bwd einsums", ein_chain, h0, Y0)
        del Y0

    if "fusedk" in which:
        NB = N // BR

        @functools.partial(jax.jit, static_argnames=("k",))
        def fk_chain(da, hb, arrs, k):
            da_pad = da.astype(jnp.bfloat16)

            def body(i, carry):
                da, tot = carry
                dht, dWt = wp.window_bwd_fused(
                    da.T, arrs["c_stream"], arrs["gt_tile_start"],
                    arrs["gt_block_of_tile"], arrs["gt_win_of_tile"],
                    arrs["gt_c_off"], msg_w, hb, n_wins=n_wins, window=BR,
                    out_rows=W, t2=T2)
                dh, dW = dht.T, dWt
                s = dh[0, 0] + dW[0, 0, 0]
                da = da.at[0, 0].set(da[0, 0]
                                     + (1e-30 * s).astype(da.dtype))
                return da, tot + s
            _, tot = jax.lax.fori_loop(0, k, body, (da_pad, jnp.float32(0)))
            return tot

        diff_chain("fused bwd kernel", fk_chain, da0,
                   h0.astype(jnp.bfloat16), arrs)

    if "dbein" in which:
        @functools.partial(jax.jit, static_argnames=("k",))
        def db_chain(da, arrs, k):
            def body(i, carry):
                da, tot = carry
                db = jnp.einsum("tn,nd->td", arrs["gt_indeg"], da,
                                preferred_element_type=jnp.float32)
                s = db[0, 0]
                da = da.at[0, 0].set(da[0, 0]
                                     + (1e-30 * s).astype(da.dtype))
                return da, tot + s
            _, tot = jax.lax.fori_loop(0, k, body, (da, jnp.float32(0)))
            return tot

        diff_chain("db indeg einsum", db_chain, da0, arrs)

    if "vgstep" in which:
        # ONE full propagation step (agg + GRU) under value_and_grad —
        # compared against vg + grubwd it isolates inter-op overhead
        fused = fuse_gru(prop["gru"])

        @functools.partial(jax.jit, static_argnames=("k",))
        def vs_chain(h, lay, k):
            def body(i, carry):
                h, tot = carry

                def loss(hh):
                    a = wp.aggregate_window(hh.astype(jnp.bfloat16), lay,
                                            msg_w, msg_b, interpret=False)
                    hn = gru_update(prop["gru"], hh, a, fused,
                                    matmul_dtype=jnp.bfloat16)
                    return jnp.sum(hn * hn)

                l, g = jax.value_and_grad(loss)(h)
                h = h + 1e-30 * g
                return h, tot + l
            _, tot = jax.lax.fori_loop(0, k, body, (h, jnp.float32(0)))
            return tot

        diff_chain("vg full step", vs_chain, h0, lay)

    if "grubwd" in which:
        fused = fuse_gru(prop["gru"])
        a0 = jax.random.normal(jax.random.PRNGKey(4), (N, D),
                               dtype=jnp.float32)

        @functools.partial(jax.jit, static_argnames=("k",))
        def gb_chain(h, a, k):
            def body(i, carry):
                h, tot = carry

                def loss(hh, aa):
                    return jnp.sum(gru_update(prop["gru"], hh, aa, fused,
                                              matmul_dtype=jnp.bfloat16)
                                   ** 2)

                l, (gh, ga) = jax.value_and_grad(loss, argnums=(0, 1))(h, a)
                h = h + 1e-30 * gh
                return h, tot + l
            _, tot = jax.lax.fori_loop(0, k, body, (h, jnp.float32(0)))
            return tot

        diff_chain("gru fwd+bwd", gb_chain, h0, a0)


if __name__ == "__main__":
    main()
