#!/usr/bin/env python
"""Why does the [262144,128]@[128,2048] node-transform matmul cost 5.3 ms
(floor: 0.7 ms FLOPs + 1.3 ms bf16 write)?  And: can a Pallas table
kernel with BLOCK-MAJOR row order (row = (src//128)·T2·128 + t·128 +
src%128 — 16 full-MXU [128,128]@[128,128] dots per program, no reshape)
hit the write-bandwidth floor?

Run ON THE TPU: python -u scripts/bench_table_kernel_probe.py
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

N, D, T = 262_144, 128, 8
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


def _table_kernel(h_ref, w_ref, b_ref, out_ref):
    for t in range(T2):
        out_ref[t * 128:(t + 1) * 128, :] = (
            jnp.dot(h_ref[...], w_ref[t],
                    preferred_element_type=jnp.float32)
            + b_ref[t, :][None, :]).astype(out_ref.dtype)


@jax.jit
def table_pallas(h_bf, w_stack, b_stack):
    n_blk = h_bf.shape[0] // 128
    return pl.pallas_call(
        _table_kernel,
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec((128, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T2, D, D), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T2, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T2 * 128, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blk * T2 * 128, D), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * D * T2 * D,
            bytes_accessed=N * D * 2 + N * T2 * D * 2,
            transcendentals=0,
        ),
    )(h_bf, w_stack, b_stack)


def main():
    key = jax.random.PRNGKey(0)
    h = jax.random.normal(key, (N, D), dtype=jnp.float32)
    w_stack = (jax.random.normal(jax.random.PRNGKey(1), (T2, D, D)) * 0.1
               ).astype(jnp.bfloat16)
    b_stack = (jax.random.normal(jax.random.PRNGKey(2), (T2, D)) * 0.1
               ).astype(jnp.bfloat16)
    w_cat = jnp.transpose(w_stack, (1, 0, 2)).reshape(D, T2 * D)

    # numerics: pallas block-major table vs XLA einsum rearranged
    hb = h.astype(jnp.bfloat16)
    got = table_pallas(hb, w_stack, b_stack)
    ref = (jnp.einsum("nd,tdf->ntf", hb, w_stack,
                      preferred_element_type=jnp.float32)
           + b_stack[None].astype(jnp.float32))
    ref_bm = ref.reshape(N // 128, 128, T2, D).transpose(0, 2, 1, 3) \
        .reshape(-1, D).astype(jnp.bfloat16)
    d = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                              - ref_bm.astype(jnp.float32))))
    print(f"table_pallas max|diff| = {d:.3e}", flush=True)

    @functools.partial(jax.jit, static_argnames=("k", "form"))
    def chain(h, k, form):
        def body(i, carry):
            h, tot = carry
            hb = h.astype(jnp.bfloat16)
            if form == "mmA":
                out = jnp.dot(hb, w_cat, preferred_element_type=jnp.float32
                              ).astype(jnp.bfloat16)
            elif form == "mmB":
                out = jnp.dot(hb, w_cat[:, :D],
                              preferred_element_type=jnp.float32
                              ).astype(jnp.bfloat16)
            elif form == "mmC":
                out = jnp.dot(hb, w_cat[:, :512],
                              preferred_element_type=jnp.float32
                              ).astype(jnp.bfloat16)
            elif form == "pallas":
                out = table_pallas(hb, w_stack, b_stack)
            s = out[0, 0].astype(jnp.float32)
            h = h.at[0, 0].set(h[0, 0] + 1e-30 * s)
            return h, tot + s
        _, tot = jax.lax.fori_loop(0, k, body, (h, jnp.float32(0)))
        return tot

    for form in ("mmA", "mmB", "mmC", "pallas"):
        diff_chain(f"[{form}]", functools.partial(chain, form=form), h)


if __name__ == "__main__":
    main()
