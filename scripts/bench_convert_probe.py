#!/usr/bin/env python
"""Attack the window kernel's 612 ns/tile: probe shows DMA is ~339 ns/tile
(packed stream halves bytes, time unchanged), so the bound is the int8→bf16
VPU convert (~270 ns/tile over [512,512]) serializing with the MXU matmul
(~340 ns/tile).  Variants, on the community headline config:

  base     — production kernel (convert then dot, same tile)
  mixed    — lax.dot_general directly on (int8, bf16) operands, letting
             Mosaic schedule the convert in the MXU feed
  pipecvt  — software-pipelined: convert tile t+1's counts (VPU) before
             dotting tile t (MXU) — breaks the per-tile VPU→MXU dependency
  int8tbl  — int8×int8→int32 MXU dot (table quantized; TIMING ONLY — a
             real quantized mode would carry per-window scales)

Run ON THE TPU: python -u scripts/bench_convert_probe.py > /tmp/cvtprobe.txt
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ggnn_tpu.data.synthetic import synthetic_batch
from ggnn_tpu.ops import window_pallas as wp

D, W, BR, T = 128, 512, 512, 8


def make_kernel(variant):
    def kernel(block_of_tile_ref, win_of_tile_ref, tile_start_ref,
               table_hbm, c_hbm, out_hbm, acc, tbl_buf, c_buf, cvt_buf,
               tbl_sem, c_sem, out_sem, *, window, nbuf, blocks_per_prog,
               block_n):
        p = pl.program_id(0)
        b0 = p * blocks_per_prog
        t0 = tile_start_ref[b0]
        t1 = tile_start_ref[b0 + blocks_per_prog]

        def tbl_dma(slot, t):
            w = win_of_tile_ref[t]
            return pltpu.make_async_copy(
                table_hbm.at[pl.ds(w * window, window), :],
                tbl_buf.at[slot], tbl_sem.at[slot])

        def cnt_dma(slot, t):
            return pltpu.make_async_copy(
                c_hbm.at[pl.ds(t * block_n, block_n), :],
                c_buf.at[slot], c_sem.at[slot])

        def in_dma(slot, t):
            return tbl_dma(slot, t), cnt_dma(slot, t)

        def out_dma(par, blk):
            return pltpu.make_async_copy(
                acc.at[par], out_hbm.at[pl.ds(blk * block_n, block_n), :],
                out_sem.at[par])

        def prolog(k, _):
            @pl.when(t0 + k < t1)
            def _():
                m, c = in_dma(k, t0 + k)
                m.start()
                c.start()
            return 0

        jax.lax.fori_loop(0, nbuf, prolog, 0, unroll=True)

        if variant == "pipecvt":
            # each tile's count DMA is waited exactly ONCE: tile t0 here,
            # tile t+1 inside iteration t (converted ahead of its dot)
            @pl.when(t0 < t1)
            def _():
                cnt_dma(0, t0).wait()
                cvt_buf[0] = c_buf[0].astype(tbl_buf.dtype)

        def body(t, _):
            slot = jax.lax.rem(t - t0, nbuf)
            blk = block_of_tile_ref[t]
            par = jax.lax.rem(blk - b0, 2)
            first = t == tile_start_ref[blk]
            last = t == tile_start_ref[blk + 1] - 1

            @pl.when(jnp.logical_and(first, blk - b0 >= 2))
            def _():
                out_dma(par, blk - 2).wait()

            tbl_dma(slot, t).wait()
            if variant != "pipecvt":
                cnt_dma(slot, t).wait()
            if variant == "base":
                prod = jnp.dot(c_buf[slot].astype(tbl_buf.dtype),
                               tbl_buf[slot],
                               preferred_element_type=jnp.float32)
            elif variant == "mixed":
                prod = jax.lax.dot_general(
                    c_buf[slot], tbl_buf[slot],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            elif variant == "int8tbl":
                prod = jnp.dot(c_buf[slot], tbl_buf[slot],
                               preferred_element_type=jnp.int32
                               ).astype(jnp.float32)
            elif variant == "pipecvt":
                # convert NEXT tile's counts first (VPU), then dot the
                # CURRENT tile's pre-converted counts (MXU) — independent
                # instructions the scheduler can overlap
                cpar = jax.lax.rem(t - t0, 2)

                @pl.when(t + 1 < t1)
                def _():
                    cnt_dma(jax.lax.rem(t + 1 - t0, nbuf), t + 1).wait()
                    cvt_buf[1 - cpar] = (c_buf[jax.lax.rem(t + 1 - t0, nbuf)]
                                         .astype(tbl_buf.dtype))

                prod = jnp.dot(cvt_buf[cpar], tbl_buf[slot],
                               preferred_element_type=jnp.float32)

            @pl.when(first)
            def _():
                acc[par] = prod

            @pl.when(jnp.logical_not(first))
            def _():
                acc[par] = acc[par] + prod

            @pl.when(t + nbuf < t1)
            def _():
                m2, c2 = in_dma(slot, t + nbuf)
                m2.start()
                c2.start()

            @pl.when(last)
            def _():
                out_dma(par, blk).start()

            return 0

        jax.lax.fori_loop(t0, t1, body, 0)
        last_blk = b0 + blocks_per_prog - 1
        if blocks_per_prog >= 2:
            out_dma(jax.lax.rem(last_blk - 1 - b0, 2), last_blk - 1).wait()
        out_dma(jax.lax.rem(last_blk - b0, 2), last_blk).wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("n_blocks", "variant", "nbuf"))
def run_variant(table, c_stream, tile_start, block_of_tile, win_of_tile,
                n_blocks, variant, nbuf=6):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, BR, D), jnp.float32),
            pltpu.VMEM((nbuf, W, D), table.dtype),
            pltpu.VMEM((nbuf, BR, W), c_stream.dtype),
            pltpu.VMEM((2, BR, W),
                       table.dtype if variant == "pipecvt" else jnp.int8),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(make_kernel(variant), window=W, nbuf=nbuf,
                               blocks_per_prog=n_blocks, block_n=BR)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * BR, D), jnp.float32),
    )(block_of_tile, win_of_tile, tile_start, table, c_stream)


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


def main():
    batch = synthetic_batch(262_144, 4_000_000, T, annotation_dim=8, seed=0,
                            node_mult=128, n_communities=512, p_intra=0.95)
    N = batch.spec.n_pad
    lay = wp.build_window_layout(
        batch.edge_src, batch.edge_dst, batch.edge_type, batch.edge_mask,
        N, window=W, n_message_types=2 * T, block_rows=BR)
    a = lay.arrays
    n_tiles = lay.n_tiles
    print(f"{lay.stats}", flush=True)
    R = 2 * T * N
    table = jax.random.normal(jax.random.PRNGKey(0), (R, D),
                              dtype=jnp.bfloat16)
    table_i8 = (table * 10).astype(jnp.int8)

    @functools.partial(jax.jit, static_argnames=("k", "variant"))
    def chain(tbl, arrs, k, variant):
        def body(i, carry):
            tbl, tot = carry
            out = run_variant(tbl, arrs["c_stream"], arrs["tile_start"],
                              arrs["block_of_tile"], arrs["win_of_tile"],
                              lay.n_blocks, variant)
            s = out[0, 0]
            tbl = tbl.at[0, 0].set(tbl[0, 0] + (1e-30 * s).astype(tbl.dtype))
            return tbl, tot + s
        _, tot = jax.lax.fori_loop(0, k, body, (tbl, jnp.float32(0)))
        return tot

    # correctness crosscheck of pipecvt vs base once (device-side compare)
    try:
        ob = run_variant(table, a["c_stream"], a["tile_start"],
                         a["block_of_tile"], a["win_of_tile"], lay.n_blocks,
                         "base")
        op = run_variant(table, a["c_stream"], a["tile_start"],
                         a["block_of_tile"], a["win_of_tile"], lay.n_blocks,
                         "pipecvt")
        print(f"pipecvt max|diff| = {float(jnp.max(jnp.abs(ob - op))):.3e}",
              flush=True)
    except Exception as e:
        print(f"crosscheck failed: {type(e).__name__}: {str(e)[:200]}",
              flush=True)

    for variant in ("base", "mixed", "pipecvt", "int8tbl"):
        tbl = table_i8 if variant == "int8tbl" else table
        try:
            t1 = timeit(lambda: float(chain(tbl, a, k=1, variant=variant)),
                        tag=f"{variant} k=1")
            t9 = timeit(lambda: float(chain(tbl, a, k=9, variant=variant)),
                        tag=f"{variant} k=9")
            per = (t9 - t1) / 8
            print(f"  => {variant}: {per * 1e3:.3f} ms "
                  f"({per / n_tiles * 1e9:.0f} ns/tile)", flush=True)
        except Exception as e:
            print(f"  => {variant} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
