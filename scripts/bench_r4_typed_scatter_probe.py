#!/usr/bin/env python
"""Round-7: split the uniform 262K forward's non-gather half.  The step
is 30.7 ms = h_pack gather 15.3 (engine floor) + REST 15.4.  Estimated
kernel floor: ~4160 tiles x max(DMA 635 ns, MXU ~700 ns) ~ 3 ms + bias
+ GRU ~1.5 — if the typed scatter measures far above that, the uniform
HEADLINE has real room (the r5 ">300M dead end" claim covered only the
gather side).

  scatter   typed_onehot_scatter alone (prebuilt h_pack, hard dep)
  fused     typed_step_gru alone (scatter + GRU epilogue)
  gru       the unfused-gru delta (fused - scatter)

Run ON THE TPU: python -u scripts/bench_r4_typed_scatter_probe.py
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
    batch = synthetic_batch(nn, ee, 8, annotation_dim=8, seed=0,
                            node_mult=128)
    lay = sp.build_typed_dst_layout(
        batch.edge_src, batch.edge_dst, batch.edge_type, batch.edge_mask,
        batch.spec.n_pad, n_message_types=16, with_grad=False)
    meta, arrs = lay.meta, lay.arrays
    n_nodes_pad, tile_e, max_tiles, n_blocks = meta[:4]
    edge_align = meta[6]
    N = batch.spec.n_pad
    n_pack = arrs["gather_idx"].shape[0]
    n_tiles = arrs["block_of_tile"].shape[0]
    print(f"N={N} pack={n_pack} tiles={n_tiles} tile_e={tile_e} "
          f"blocks={n_blocks} align={edge_align}", flush=True)

    h = jax.random.normal(jax.random.PRNGKey(1), (N, D), jnp.float32)
    h_pack0 = jax.jit(lambda hh, i: hh.astype(jnp.bfloat16)[i])(
        h, arrs["gather_idx"])
    h_pack0 = jax.block_until_ready(h_pack0)

    @functools.partial(jax.jit, static_argnames=("k",))
    def scatter(hp, arrs_, k):
        def body(i, acc):
            hp2 = hp + (acc[0, 0] * 1e-30).astype(hp.dtype)  # hard dep
            out = sp.typed_onehot_scatter(
                hp2, arrs_["dstl"], arrs_["tile_start"],
                arrs_["block_of_tile"], arrs_["tile_msg_off"],
                arrs_["c_off"], arrs_["tile_type"], msg_w,
                n_blocks=n_blocks, tile_e=tile_e, align=edge_align,
                blk_off16=arrs_.get("blk_off16"),
                span_rows=(meta[9] if len(meta) > 9 else None),
                interpret=INTERP)
            return acc + out[:8].astype(jnp.float32)
        acc = jax.lax.fori_loop(0, k, body, jnp.zeros((8, D), jnp.float32))
        return jnp.sum(acc)

    print(f"device: {jax.devices()[0]}", flush=True)
    r = {}
    r["scatter"] = diff(
        "scatter",
        lambda: float(scatter(h_pack0, arrs, k=1)),
        lambda: float(scatter(h_pack0, arrs, k=K)))
    est_dma = n_tiles * (tile_e * D * 2) / 819e9
    est_mxu = n_tiles * (2 * 2 * tile_e * D * D) / 197e12
    print(f"\n  floor est: DMA {est_dma * 1e3:.2f} ms, MXU "
          f"{est_mxu * 1e3:.2f} ms -> max {max(est_dma, est_mxu) * 1e3:.2f}",
          flush=True)
    print(f"  measured/floor = "
          f"{r['scatter'] / max(est_dma, est_mxu):.2f}x", flush=True)


if __name__ == "__main__":
    main()
