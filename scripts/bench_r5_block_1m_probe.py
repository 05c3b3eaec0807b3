#!/usr/bin/env python
"""Round-8: why does the per-block typed kernel LOSE at 1M (82.6M vs the
round-6 chunked per-tile 117.0M) while winning +35% at 262K?

Components (chained differencing, hard deps):
  gather       h_pack = h[idx] alone (the known ~5.7 ns/row cliff term)
  scatter_blk  typed_block_scatter alone (prebuilt pack)
  fused_blk    typed_block_step_gru alone
  scatter_tile the SMEM-chunked per-tile production path (block_mode=False)
  fused_tile   chunked per-tile fused step

Run ON THE TPU: python -u scripts/bench_r5_block_1m_probe.py
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
from ggnn_tpu.models.ggnn import fuse_gru
from ggnn_tpu.ops import scatter_pallas as sp

INTERP = jax.default_backend() != "tpu"
K = 3


def timeit(fn, tag, iters=2, warmup=1):
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
    print(f"{tag}: {per * 1e3:.2f} ms/iter", flush=True)
    return per


def main():
    small = os.environ.get("PROBE_SMALL") == "1"
    D = 128
    nn, ee = (4096, 65536) if small else (1_000_000, 10_000_000)
    which = os.environ.get("PROBE_ONLY", "").split(",")

    def want(tag):
        return not which or which == [""] or tag in which

    cfg = ModelConfig(state_dim=D, annotation_dim=8, n_edge_types=8,
                      compute_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(0), cfg)
    msg_w = params["prop"]["msg_w"].astype(jnp.bfloat16)
    gru = params["prop"]["gru"]
    w_a, b_all, u_zr = fuse_gru(gru)
    batch = synthetic_batch(nn, ee, 8, annotation_dim=8, seed=0,
                            node_mult=128)
    lay_b = sp.build_typed_dst_layout(
        batch.edge_src, batch.edge_dst, batch.edge_type, batch.edge_mask,
        batch.spec.n_pad, n_message_types=16, with_grad=False)
    lay_t = sp.build_typed_dst_layout(
        batch.edge_src, batch.edge_dst, batch.edge_type, batch.edge_mask,
        batch.spec.n_pad, n_message_types=16, with_grad=False,
        block_mode=False)
    assert lay_b.meta[10] is not None
    S8, cmax, b_span = lay_b.meta[10]
    n_blocks, tile_e = lay_b.meta[3], lay_b.meta[1]
    N = batch.spec.n_pad
    print(f"N={N} blocks={n_blocks} tile_e={tile_e} S8={S8} cmax={cmax} "
          f"span={b_span} slots={lay_b.arrays['slot_off16'].shape[0]} "
          f"tile-layout chunks={lay_t.meta[8]}", flush=True)

    h = jax.random.normal(jax.random.PRNGKey(1), (N, D), jnp.float32)
    hb = jax.jit(lambda x: x.astype(jnp.bfloat16))(h)
    hb = jax.block_until_ready(hb)

    @functools.partial(jax.jit, static_argnames=("k",))
    def gather_only(hh, idx, k):
        def body(i, acc):
            # data-dependent zero perturbs the INDEX (probe hygiene —
            # LICM hoists loop-invariant gathers)
            z = (acc[0, 0] * 1e-30).astype(jnp.int32)
            p = hh[idx + z]
            return acc + p[:8].astype(jnp.float32)
        acc = jax.lax.fori_loop(0, k, body, jnp.zeros((8, D), jnp.float32))
        return jnp.sum(acc)

    def mk_pack(lay):
        p = jax.jit(lambda x, i: x.astype(jnp.bfloat16)[i])(
            h, lay.arrays["gather_idx"])
        return jax.block_until_ready(p)

    print(f"device: {jax.devices()[0]}", flush=True)
    r = {}
    if want("gather"):
        r["gather"] = diff(
            "gather",
            lambda: float(gather_only(hb, lay_b.arrays["gather_idx"], 1)),
            lambda: float(gather_only(hb, lay_b.arrays["gather_idx"], K)))

    if want("scatter_blk") or want("fused_blk"):
        pack_b = mk_pack(lay_b)

    if want("scatter_blk"):
        @functools.partial(jax.jit, static_argnames=("k",))
        def scatter_blk(hp, arrs_, k):
            def body(i, acc):
                hp2 = hp + (acc[0, 0] * 1e-30).astype(hp.dtype)
                out = sp.typed_block_scatter(
                    hp2, arrs_["dstl_blk"], arrs_["slot_off16"],
                    arrs_["blk_off16"], msg_w, n_blocks=n_blocks,
                    tile_e=tile_e, S8=S8, cmax=cmax, span_rows=b_span,
                    interpret=INTERP)
                return acc + out[:8].astype(jnp.float32)
            acc = jax.lax.fori_loop(0, k, body,
                                    jnp.zeros((8, D), jnp.float32))
            return jnp.sum(acc)

        r["scatter_blk"] = diff(
            "scatter_blk",
            lambda: float(scatter_blk(pack_b, lay_b.arrays, 1)),
            lambda: float(scatter_blk(pack_b, lay_b.arrays, K)))

    # full aggregation step via _aggregate_impl (handles chunked per-tile
    # dispatch) — includes the gather, so subtract r["gather"]
    msg_b_c = params["prop"]["msg_b"].astype(jnp.bfloat16)

    def agg_fn(lay):
        meta = lay.meta

        @functools.partial(jax.jit, static_argnames=("k",))
        def agg(hh, arrs_, k):
            def body(i, acc):
                h2 = hh + (acc[0, 0] * 1e-30).astype(hh.dtype)
                out = sp._aggregate_impl(meta, INTERP, arrs_, h2, msg_w,
                                         msg_b_c)
                return acc + out[:8].astype(jnp.float32)
            acc = jax.lax.fori_loop(0, k, body,
                                    jnp.zeros((8, D), jnp.float32))
            return jnp.sum(acc)
        return agg

    if want("agg_blk"):
        agg_b = agg_fn(lay_b)
        r["agg_blk"] = diff(
            "agg_blk",
            lambda: float(agg_b(hb, lay_b.arrays, 1)),
            lambda: float(agg_b(hb, lay_b.arrays, K)))
    if want("agg_tile"):
        agg_t = agg_fn(lay_t)
        r["agg_tile"] = diff(
            "agg_tile",
            lambda: float(agg_t(hb, lay_t.arrays, 1)),
            lambda: float(agg_t(hb, lay_t.arrays, K)))

    print("\nsummary:", {k: f"{v * 1e3:.2f} ms" for k, v in r.items()},
          flush=True)


if __name__ == "__main__":
    main()
