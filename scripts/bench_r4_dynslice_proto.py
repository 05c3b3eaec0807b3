#!/usr/bin/env python
"""Round-7: isolate the Mosaic cost of DYNAMIC 16-aligned VMEM row
slices as dot operands — the gating risk for the per-block-DMA typed
scatter restructure (DESIGN.md "tile-count floor", round-8 lead #1).

Both variants DMA one [SPAN, D] bf16 block span per grid step (2-slot
ring) and run T2 chunked one-hot+W dots from VMEM:
  static   chunk offsets are compile-time (t * CHUNK)
  dynamic  chunk offsets come from a prefetched i32 array (16-aligned,
           data-dependent)

If dynamic ~= static and both ~= (DMA + dot floor), the restructure is
viable: predicted ~2048 blocks x (DMA 1 MB + 16 chunk iterations).

Run ON THE TPU: python -u scripts/bench_r4_dynslice_proto.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERP = jax.default_backend() != "tpu"
K = 5
D = 128
CHUNK = 256
T2 = 16
SPAN = T2 * CHUNK          # 4096 rows per block span
NBLK = 2048


def _kernel(offs_ref, rows_ref, pack_hbm, w_hbm, out_hbm, h_buf, acc,
            w_buf, h_sem, out_sem, *, dynamic):
    wcp = pltpu.make_async_copy(w_hbm, w_buf, h_sem.at[0])
    wcp.start()
    wcp.wait()

    def span_dma(slot, b):
        return pltpu.make_async_copy(
            pack_hbm.at[pl.ds(b * SPAN, SPAN), :], h_buf.at[slot],
            h_sem.at[slot])

    span_dma(0, 0).start()
    if NBLK > 1:
        span_dma(1, 1).start()

    def out_dma(slot, b):
        return pltpu.make_async_copy(
            acc.at[slot], out_hbm.at[pl.ds(b * D, D), :], out_sem.at[slot])

    def body(b, _):
        slot = jax.lax.rem(b, 2)
        span_dma(slot, b).wait()
        acc[slot] = jnp.zeros_like(acc[slot])
        for t in range(T2):
            if dynamic:
                # offsets stored PRE-DIVIDED by 16 and rescaled here, so
                # Mosaic can statically prove 16-sublane alignment (a
                # raw data-dependent index fails with "cannot statically
                # prove that index in dimension 1 is a multiple of 8")
                off = offs_ref[b * T2 + t] * 16
                seg = h_buf[slot, pl.ds(off, CHUNK), :]
            else:
                seg = h_buf[slot, pl.ds(t * CHUNK, CHUNK), :]
            # one-hot from a per-chunk dst-row vector (synthetic: iota
            # pattern shifted by a prefetched scalar so it is not
            # constant-folded); same VPU work as the real dstl compare
            r0 = rows_ref[b * T2 + t]
            row = (jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
                   + r0) % D
            oh = (jax.lax.broadcasted_iota(jnp.int32, (D, CHUNK), 0)
                  == row).astype(seg.dtype)
            p0 = jnp.dot(oh, seg, preferred_element_type=jnp.float32)
            acc[slot] = acc[slot] + jnp.dot(
                p0.astype(w_buf.dtype), w_buf[t],
                preferred_element_type=jnp.float32)
        out_dma(slot, b).start()

        @pl.when(b >= 1)
        def _():
            out_dma(jax.lax.rem(b - 1, 2), b - 1).wait()

        @pl.when(b + 2 < NBLK)
        def _():
            span_dma(slot, b + 2).start()
        return 0

    jax.lax.fori_loop(0, NBLK, body, 0)
    out_dma((NBLK - 1) % 2, NBLK - 1).wait()


@functools.partial(jax.jit, static_argnames=("dynamic", "k"))
def run(pack, w, offs, rows, dynamic, k):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, SPAN, D), pack.dtype),
            pltpu.VMEM((2, D, D), jnp.float32),
            pltpu.VMEM((T2, D, D), w.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ])
    kern = functools.partial(_kernel, dynamic=dynamic)

    def one(i, acc):
        # hard dep: shift the row patterns by a data-dependent zero
        z = (acc * 1e-30).astype(jnp.int32)
        out = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((NBLK * D, D), jnp.float32),
            interpret=INTERP)(offs, rows + z, pack, w)
        return acc + out[0, 0]
    return jax.lax.fori_loop(0, k, one, jnp.float32(0))


def timeit(fn, tag):
    t0 = time.perf_counter()
    fn()
    comp = time.perf_counter() - t0
    fn()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"  {tag}: {best * 1e3:.2f} ms (compile {comp:.0f}s)",
          flush=True)
    return best


def main():
    global NBLK
    if os.environ.get("PROBE_SMALL") == "1":
        NBLK = 8
    rng = np.random.default_rng(0)
    pack = jnp.asarray(rng.standard_normal((NBLK * SPAN, D)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((T2, D, D)) * 0.1, jnp.bfloat16)
    # dynamic offsets: a 16-aligned permutation of the static ones
    base = (np.arange(T2) * CHUNK)
    offs = np.stack([rng.permutation(base) for _ in range(NBLK)])
    offs = jnp.asarray(offs.reshape(-1) // 16, jnp.int32)
    rows = jnp.asarray(rng.integers(0, D, NBLK * T2), jnp.int32)
    print(f"device: {jax.devices()[0]}  NBLK={NBLK} span={SPAN} "
          f"pack={NBLK * SPAN * D * 2 / 1e6:.0f}MB", flush=True)
    for dyn in (False, True):
        tag = "dynamic" if dyn else "static"
        t1 = timeit(lambda: float(run(pack, w, offs, rows, dyn, 1)),
                    tag + " k=1")
        tk = timeit(lambda: float(run(pack, w, offs, rows, dyn, K)),
                    tag + f" k={K}")
        per = (tk - t1) / (K - 1)
        if per <= 0:
            per = tk / K
        print(f"{tag}: {per * 1e3:.2f} ms  "
              f"({per / (NBLK * T2) * 1e9:.0f} ns/chunk)", flush=True)


if __name__ == "__main__":
    main()
