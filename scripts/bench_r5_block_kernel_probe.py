#!/usr/bin/env python
"""Round-8 (driver round 5): A/B the per-BLOCK typed scatter kernel
(static (type, chunk) inner loop — scatter_pallas._typed_block_kernel)
against the per-tile production kernel at the uniform headline config.

The round-7 diagnosis: the per-tile kernel pays ~330 ns/tile of scalar
machinery against a 32K-tile floor (16.7 ms scatter vs 3.4 floor); the
dynslice prototype ran the same per-chunk work at 112 ns.  This probe
measures the REAL kernel:

  scatter_tile    per-tile kernel (span auto — production round-7 state)
  scatter_blk_g   per-block kernel, guard=True  (branch-skip empty slots)
  scatter_blk_n   per-block kernel, guard=False (no branches, zero-oh)
  fused_tile      typed_step_gru (per-tile, the round-7 headline path)
  fused_blk       typed_block_step_gru

Run ON THE TPU: python -u scripts/bench_r5_block_kernel_probe.py
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
K = 5


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
    print(f"{tag}: {per * 1e3:.2f} ms/iter", flush=True)
    return per


def main():
    small = os.environ.get("PROBE_SMALL") == "1"
    D = 128
    nn, ee = (2048, 32768) if small else (262_144, 4_000_000)
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
    assert lay_b.meta[10] is not None, "block mode must engage"
    S8, cmax, b_span = lay_b.meta[10]
    n_blocks, tile_e = lay_b.meta[3], lay_b.meta[1]
    N = batch.spec.n_pad
    n_tiles = lay_t.arrays["block_of_tile"].shape[0]
    n_slots = lay_b.arrays["slot_off16"].shape[0]
    n_real = int(np.asarray(lay_b.arrays["slot_off16"] >= 0).sum())
    print(f"N={N} blocks={n_blocks} tile_e={tile_e} tiles={n_tiles} "
          f"S8={S8} cmax={cmax} span={b_span} slots={n_slots} "
          f"real_slots={n_real}", flush=True)

    h = jax.random.normal(jax.random.PRNGKey(1), (N, D), jnp.float32)
    h_pack0 = jax.jit(lambda hh, i: hh.astype(jnp.bfloat16)[i])(
        h, lay_b.arrays["gather_idx"])
    h_pack0 = jax.block_until_ready(h_pack0)

    @functools.partial(jax.jit, static_argnames=("k", "guard"))
    def scatter_blk(hp, arrs_, k, guard):
        def body(i, acc):
            hp2 = hp + (acc[0, 0] * 1e-30).astype(hp.dtype)  # hard dep
            out = sp.typed_block_scatter(
                hp2, arrs_["dstl_blk"], arrs_["slot_off16"],
                arrs_["blk_off16"], msg_w, n_blocks=n_blocks,
                tile_e=tile_e, S8=S8, cmax=cmax, span_rows=b_span,
                guard=guard, interpret=INTERP)
            return acc + out[:8].astype(jnp.float32)
        acc = jax.lax.fori_loop(0, k, body, jnp.zeros((8, D), jnp.float32))
        return jnp.sum(acc)

    meta_t, arrs_t = lay_t.meta, lay_t.arrays

    @functools.partial(jax.jit, static_argnames=("k",))
    def scatter_tile(hp, arrs_, k):
        def body(i, acc):
            hp2 = hp + (acc[0, 0] * 1e-30).astype(hp.dtype)
            out = sp.typed_onehot_scatter(
                hp2, arrs_["dstl"], arrs_["tile_start"],
                arrs_["block_of_tile"], arrs_["tile_msg_off"],
                arrs_["c_off"], arrs_["tile_type"], msg_w,
                n_blocks=n_blocks, tile_e=meta_t[1], align=meta_t[6],
                blk_off16=arrs_.get("blk_off16"),
                span_rows=(meta_t[9] if len(meta_t) > 9 else None),
                interpret=INTERP)
            return acc + out[:8].astype(jnp.float32)
        acc = jax.lax.fori_loop(0, k, body, jnp.zeros((8, D), jnp.float32))
        return jnp.sum(acc)

    # fused step operands (bias init + padded state)
    bias = jax.jit(lambda: jnp.einsum(
        "tn,td->nd", lay_b.arrays["indeg"],
        params["prop"]["msg_b"].astype(jnp.float32),
        preferred_element_type=jnp.float32))()
    n_rows = n_blocks * sp.BLOCK_N
    h_pad = jax.jit(lambda hh: jnp.pad(
        hh.astype(jnp.float32), ((0, n_rows - N), (0, 0))))(h)
    cdt = jnp.bfloat16
    gargs = (w_a.astype(cdt), b_all[None, :].astype(jnp.float32),
             u_zr.astype(cdt), gru["uh"].astype(cdt))

    # bias/h_pad must flow through jit ARGUMENTS (closure constants blow
    # the remote-compile payload — HTTP 413)
    @functools.partial(jax.jit, static_argnames=("k", "guard"))
    def fused_blk(hp, arrs_, bias_, h_pad_, k, guard):
        def body(i, acc):
            hp2 = hp + (acc[0, 0] * 1e-30).astype(hp.dtype)
            out = sp.typed_block_step_gru(
                hp2, arrs_["dstl_blk"], arrs_["slot_off16"],
                arrs_["blk_off16"], msg_w, bias_, h_pad_, *gargs,
                n_blocks=n_blocks, tile_e=tile_e, S8=S8, cmax=cmax,
                span_rows=b_span, guard=guard, interpret=INTERP)
            return acc + out[:8].astype(jnp.float32)
        acc = jax.lax.fori_loop(0, k, body, jnp.zeros((8, D), jnp.float32))
        return jnp.sum(acc)

    @functools.partial(jax.jit, static_argnames=("k",))
    def fused_tile(hp, arrs_, bias_, h_pad_, k):
        def body(i, acc):
            hp2 = hp + (acc[0, 0] * 1e-30).astype(hp.dtype)
            out = sp.typed_step_gru(
                hp2, arrs_["dstl"], arrs_["tile_start"],
                arrs_["block_of_tile"], arrs_["tile_msg_off"],
                arrs_["c_off"], arrs_["tile_type"], msg_w, bias_, h_pad_,
                *gargs, n_blocks=n_blocks, tile_e=meta_t[1],
                align=meta_t[6], blk_off16=arrs_.get("blk_off16"),
                span_rows=(meta_t[9] if len(meta_t) > 9 else None),
                interpret=INTERP)
            return acc + out[:8].astype(jnp.float32)
        acc = jax.lax.fori_loop(0, k, body, jnp.zeros((8, D), jnp.float32))
        return jnp.sum(acc)

    # tile_e=512 layout: cmax collapses to 1 -> 32768 slots (one per
    # (block, type) group) at the cost of wider per-slot dots
    lay_5 = sp.build_typed_dst_layout(
        batch.edge_src, batch.edge_dst, batch.edge_type, batch.edge_mask,
        batch.spec.n_pad, n_message_types=16, with_grad=False, tile_e=512)
    S8_5, cmax_5, span_5 = lay_5.meta[10]
    print(f"tile_e=512 layout: S8={S8_5} cmax={cmax_5} span={span_5} "
          f"slots={lay_5.arrays['slot_off16'].shape[0]}", flush=True)
    # lay_5 has its OWN pack (different e_pack/offsets) — reusing lay_b's
    # h_pack with lay_5 offsets reads out of bounds (TPU Internal error)
    h_pack5 = jax.jit(lambda hh, i: hh.astype(jnp.bfloat16)[i])(
        h, lay_5.arrays["gather_idx"])
    h_pack5 = jax.block_until_ready(h_pack5)

    @functools.partial(jax.jit, static_argnames=("k", "guard"))
    def scatter_blk5(hp, arrs_, k, guard):
        def body(i, acc):
            hp2 = hp + (acc[0, 0] * 1e-30).astype(hp.dtype)
            out = sp.typed_block_scatter(
                hp2, arrs_["dstl_blk"], arrs_["slot_off16"],
                arrs_["blk_off16"], msg_w, n_blocks=n_blocks,
                tile_e=512, S8=S8_5, cmax=cmax_5, span_rows=span_5,
                guard=guard, interpret=INTERP)
            return acc + out[:8].astype(jnp.float32)
        acc = jax.lax.fori_loop(0, k, body, jnp.zeros((8, D), jnp.float32))
        return jnp.sum(acc)

    which = os.environ.get("PROBE_ONLY", "").split(",")

    def want(tag):
        return not which or which == [""] or tag in which

    print(f"device: {jax.devices()[0]}", flush=True)
    r = {}
    if want("scatter_blk_g"):
        r["scatter_blk_g"] = diff(
            "scatter_blk_g",
            lambda: float(scatter_blk(h_pack0, lay_b.arrays, k=1,
                                      guard=True)),
            lambda: float(scatter_blk(h_pack0, lay_b.arrays, k=K,
                                      guard=True)))
    if want("scatter_blk_n"):
        r["scatter_blk_n"] = diff(
            "scatter_blk_n",
            lambda: float(scatter_blk(h_pack0, lay_b.arrays, k=1,
                                      guard=False)),
            lambda: float(scatter_blk(h_pack0, lay_b.arrays, k=K,
                                      guard=False)))
    if want("scatter_blk5_n"):
        r["scatter_blk5_n"] = diff(
            "scatter_blk5_n",
            lambda: float(scatter_blk5(h_pack5, lay_5.arrays, k=1,
                                       guard=False)),
            lambda: float(scatter_blk5(h_pack5, lay_5.arrays, k=K,
                                       guard=False)))
    if want("scatter_tile"):
        r["scatter_tile"] = diff(
            "scatter_tile",
            lambda: float(scatter_tile(h_pack0, arrs_t, k=1)),
            lambda: float(scatter_tile(h_pack0, arrs_t, k=K)))
    if want("fused_blk"):
        r["fused_blk"] = diff(
            "fused_blk",
            lambda: float(fused_blk(h_pack0, lay_b.arrays, bias, h_pad,
                                    k=1, guard=False)),
            lambda: float(fused_blk(h_pack0, lay_b.arrays, bias, h_pad,
                                    k=K, guard=False)))
    if want("fused_tile"):
        r["fused_tile"] = diff(
            "fused_tile",
            lambda: float(fused_tile(h_pack0, arrs_t, bias, h_pad, k=1)),
            lambda: float(fused_tile(h_pack0, arrs_t, bias, h_pad, k=K)))
    print("\nsummary:", {k: f"{v * 1e3:.2f} ms" for k, v in r.items()},
          flush=True)


if __name__ == "__main__":
    main()
