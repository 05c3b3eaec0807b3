#!/usr/bin/env python
"""Round-4 decomposition of the community TRAIN step under the CURRENT
emit_res fused stack (VERDICT r3 #1: the 8.1/5.0/GRU split is two rounds
old — re-probe before touching anything).

Config = the community train headline: 262K nodes / 8M directed edges /
512 communities, block_rows=512, window=512, on_demand, bf16, fused step.

Components (all k-chain-differenced so the fixed tunnel roundtrip
cancels):
  fwd_plain   gru_window_step primal (serving compile, no residuals)
  fwd_emit    _fused_step_impl emit_res=True (the fwd actually run
              under differentiation: + residual stream writes)
  train_full  value_and_grad of sum(step(h)^2) — the whole VJP
  gru_bwd     gru_cell_bwd alone on realistic residuals
  agg_bwd     _aggregate_window_bwd alone (spill bwd + fused kernel + db)
  spill_bwd   _spill_backward alone
  kernel_bwd  window_bwd_fused alone (the transposed fused kernel)

Expected: train_full ≈ fwd_emit + gru_bwd + agg_bwd (+ misc);
agg_bwd ≈ spill_bwd + kernel_bwd + db-matmul.

Run ON THE TPU (one job at a time):
  python -u scripts/bench_r4_bwd_probe.py > /tmp/r4_bwd_probe.log 2>&1
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
from ggnn_tpu.ops import window_pallas as wp
from ggnn_tpu.ops.gru_pallas import gru_cell_bwd

INTERP = jax.default_backend() != "tpu"
K = 5          # chain length
E_DIR = None   # filled after batch build


def timeit(fn, tag, iters=3, warmup=1):
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
    print(f"  {tag}: {best * 1e3:.2f} ms (compile {comp:.0f}s)",
          flush=True)
    return best


def diff(tag, f1, fk):
    t1 = timeit(f1, tag + " k=1")
    tk = timeit(fk, tag + f" k={K}")
    per = (tk - t1) / (K - 1)
    if per <= 0:
        per = tk / K
    rate = E_DIR / per
    print(f"{tag}: {per * 1e3:.2f} ms/iter  ({rate / 1e6:.1f}M edges/s "
          f"at one prop-step each)", flush=True)
    return per


def main():
    global E_DIR
    small = os.environ.get("PROBE_SMALL") == "1"
    D = 128
    cfg = ModelConfig(state_dim=D, annotation_dim=8, n_edge_types=8,
                      compute_dtype="bfloat16", backend="window",
                      fuse_gru=True)
    params = init_params(jax.random.PRNGKey(1), cfg)
    gru = params["prop"]["gru"]
    msg_w = params["prop"]["msg_w"].astype(jnp.bfloat16)
    msg_b = params["prop"]["msg_b"].astype(jnp.bfloat16)
    wa = jnp.concatenate([gru["wz"], gru["wr"], gru["wh"]], axis=1)
    b3 = jnp.concatenate([gru["bz"], gru["br"], gru["bh"]])[None, :]
    uzr = jnp.concatenate([gru["uz"], gru["ur"]], axis=1)
    uh = gru["uh"]

    nn, ee, nc, br, win = ((2048, 32768, 16, 128, 128) if small
                           else (262_144, 4_000_000, 512, 512, 512))
    batch = synthetic_batch(nn, ee, 8, annotation_dim=8,
                            seed=0, node_mult=128, n_communities=nc,
                            p_intra=0.95)
    E_DIR = int(batch.edge_mask.sum())
    lay = wp.build_window_layout(
        batch.edge_src, batch.edge_dst, batch.edge_type, batch.edge_mask,
        batch.spec.n_pad, window=win, n_message_types=16, block_rows=br,
        with_grad=True, typed_spill=True, on_demand=True,
        row_major="block")
    print(f"layout: {lay.stats}", flush=True)
    meta, arrs = lay.meta, lay.arrays
    (n_nodes_pad, W, n_tiles, n_blocks, spill_meta, row_major, grad_meta,
     block_rows) = meta[:8]
    n_wins, _, sp_offs = grad_meta[:3]
    sb_meta = grad_meta[3] if len(grad_meta) > 3 else None
    T2 = 16
    N = batch.spec.n_pad
    n_rows = n_blocks * block_rows
    print(f"N={N} n_rows={n_rows} n_blocks={n_blocks} n_wins={n_wins} "
          f"E={E_DIR}", flush=True)

    h = jax.random.normal(jax.random.PRNGKey(2), (N, D), jnp.float32)

    # ---- fwd_plain ----
    @functools.partial(jax.jit, static_argnames=("k",))
    def fwd_plain(h, arrs_, k):
        lay_k = wp.DeviceWindowLayout(meta=meta, arrays=arrs_)

        def body(i, h):
            hn = wp.gru_window_step(h, lay_k, msg_w, msg_b, gru,
                                    interpret=INTERP)
            return h * 0 + hn  # feed back (same cost class as train scan)
        h = jax.lax.fori_loop(0, k, body, h)
        return jnp.sum(h)

    # ---- fwd_emit ----
    @functools.partial(jax.jit, static_argnames=("k",))
    def fwd_emit(h, arrs_, k):
        def body(i, h):
            hn, resid = wp._fused_step_impl(
                meta, INTERP, arrs_, h, msg_w, msg_b, wa, b3, uzr, uh,
                jnp.zeros((0, D), jnp.float32), emit_res=True)
            return h * 0 + hn[:N] + 1e-30 * resid[0, :D]
        h = jax.lax.fori_loop(0, k, body, h)
        return jnp.sum(h)

    # ---- train_full ----
    @functools.partial(jax.jit, static_argnames=("k",))
    def train_full(h, arrs_, k):
        lay_k = wp.DeviceWindowLayout(meta=meta, arrays=arrs_)

        def loss(hh):
            hn = wp.gru_window_step(hh, lay_k, msg_w, msg_b, gru,
                                    interpret=INTERP)
            return jnp.sum(hn * hn)

        def body(i, h):
            s, g = jax.value_and_grad(loss)(h)
            return h * 0 + g + 1e-30 * s
        h = jax.lax.fori_loop(0, k, body, h)
        return jnp.sum(h)

    # residuals for component probes (computed once, NOT timed).  arrs
    # flows through jit ARGUMENTS — a closure would capture ~2 GB of
    # stream constants into the compile payload (HTTP 413 remotely)
    hn, resid = jax.jit(lambda h, a: wp._fused_step_impl(
        meta, INTERP, a, h, msg_w, msg_b, wa, b3, uzr, uh,
        jnp.zeros((0, D), jnp.float32), emit_res=True))(h, arrs)
    resid = jax.block_until_ready(resid)
    hc = h.astype(jnp.bfloat16)
    g0 = jax.random.normal(jax.random.PRNGKey(3), (N, D), jnp.float32)

    # ---- gru_bwd ----
    @functools.partial(jax.jit, static_argnames=("k",))
    def gru_bwd(g, resid, hc, k):
        a = resid[:N, :D]
        z = resid[:N, D:2 * D]
        r = resid[:N, 2 * D:3 * D]
        htil = resid[:N, 3 * D:]

        def body(i, g):
            dh1, da, dwa, db3_, duzr, duh = gru_cell_bwd(
                g, hc, a, z, r, htil, wa, uzr, uh, mdt="bfloat16",
                interpret=INTERP)
            return g * 0 + dh1 + 1e-30 * da[0, 0]
        g = jax.lax.fori_loop(0, k, body, g)
        return jnp.sum(g)

    # ---- agg_bwd ----
    @functools.partial(jax.jit, static_argnames=("k",))
    def agg_bwd(da, arrs_, hc, k):
        def body(i, da):
            d_arrs, dh, dW, dbm = wp._aggregate_window_bwd(
                meta, INTERP, (arrs_, hc, msg_w), da)
            return da * 0 + dh.astype(jnp.float32) + 1e-30 * dW[0, 0, 0]
        da = jax.lax.fori_loop(0, k, body, da)
        return jnp.sum(da)

    # ---- spill_bwd ----
    @functools.partial(jax.jit, static_argnames=("k",))
    def spill_bwd(da, arrs_, hc, k):
        def body(i, da):
            da_f = jnp.pad(da, ((0, n_rows - N), (0, 0)))
            dh_sp, dW_sp = wp._spill_backward(arrs_, sp_offs, sb_meta, hc,
                                              da_f, msg_w, INTERP)
            return da * 0 + dh_sp + 1e-30 * dW_sp[0, 0, 0]
        da = jax.lax.fori_loop(0, k, body, da)
        return jnp.sum(da)

    # ---- kernel_bwd ----
    @functools.partial(jax.jit, static_argnames=("k",))
    def kernel_bwd(da, arrs_, hc, k):
        def body(i, da):
            da_pad = jnp.pad(da, ((0, n_rows - N), (0, 0))).astype(
                jnp.bfloat16)
            dht, dWt = wp.window_bwd_fused(
                da_pad.T, arrs_["c_stream"], arrs_["gt_tile_start"],
                arrs_["gt_block_of_tile"], arrs_["gt_win_of_tile"],
                arrs_["gt_c_off"], msg_w, hc, n_wins=n_wins,
                window=block_rows, out_rows=W, t2=T2,
                nbuf=int(os.environ.get("PROBE_NBUF", "6")),
                interpret=INTERP)
            return da * 0 + dht.T.astype(jnp.float32) + 1e-30 * dWt[0, 0, 0]
        da = jax.lax.fori_loop(0, k, body, da)
        return jnp.sum(da)

    print(f"device: {jax.devices()[0]}", flush=True)
    only = os.environ.get("PROBE_ONLY")
    only = set(only.split(",")) if only else None
    r = {}
    if only is None or "train_full" in only:
        r["train_full"] = diff(
            "train_full", lambda: float(train_full(h, arrs, k=1)),
            lambda: float(train_full(h, arrs, k=K)))
    if only is None or "fwd_plain" in only:
        r["fwd_plain"] = diff(
            "fwd_plain", lambda: float(fwd_plain(h, arrs, k=1)),
            lambda: float(fwd_plain(h, arrs, k=K)))
    if only is None or "fwd_emit" in only:
        r["fwd_emit"] = diff(
            "fwd_emit", lambda: float(fwd_emit(h, arrs, k=1)),
            lambda: float(fwd_emit(h, arrs, k=K)))
    if only is None or "gru_bwd" in only:
        r["gru_bwd"] = diff(
            "gru_bwd", lambda: float(gru_bwd(g0, resid, hc, k=1)),
            lambda: float(gru_bwd(g0, resid, hc, k=K)))
    if only is None or "agg_bwd" in only:
        r["agg_bwd"] = diff(
            "agg_bwd", lambda: float(agg_bwd(g0, arrs, hc, k=1)),
            lambda: float(agg_bwd(g0, arrs, hc, k=K)))
    if only is None or "spill_bwd" in only:
        r["spill_bwd"] = diff(
            "spill_bwd", lambda: float(spill_bwd(g0, arrs, hc, k=1)),
            lambda: float(spill_bwd(g0, arrs, hc, k=K)))
    if only is None or "kernel_bwd" in only:
        r["kernel_bwd"] = diff(
            "kernel_bwd", lambda: float(kernel_bwd(g0, arrs, hc, k=1)),
            lambda: float(kernel_bwd(g0, arrs, hc, k=K)))

    print("\n=== summary (ms/iter) ===", flush=True)
    for k, v in r.items():
        print(f"  {k:12s} {v * 1e3:8.2f}", flush=True)
    if not {"train_full", "fwd_emit", "gru_bwd", "agg_bwd", "spill_bwd",
            "kernel_bwd", "fwd_plain"} <= set(r):
        return
    bwd = r["train_full"] - r["fwd_emit"]
    print(f"  implied bwd  {bwd * 1e3:8.2f} (gru {r['gru_bwd'] * 1e3:.2f}"
          f" + agg {r['agg_bwd'] * 1e3:.2f} + misc "
          f"{(bwd - r['gru_bwd'] - r['agg_bwd']) * 1e3:.2f})", flush=True)
    print(f"  emit tax     {(r['fwd_emit'] - r['fwd_plain']) * 1e3:8.2f}",
          flush=True)
    print(f"  agg split    spill {r['spill_bwd'] * 1e3:.2f} + kernel "
          f"{r['kernel_bwd'] * 1e3:.2f} + rest "
          f"{(r['agg_bwd'] - r['spill_bwd'] - r['kernel_bwd']) * 1e3:.2f}",
          flush=True)


if __name__ == "__main__":
    main()
