#!/usr/bin/env python
"""Train-path probe: the round-3 fwd gains (block-major table kernel)
did not move the train bench (104M vs 105M edges/s).  Isolate:

  - value_and_grad of the aggregation, src-major vs block-major layouts
    (is the block-major backward einsum family slower?)
  - the backward reduction einsums standalone, both row orders.

Run ON THE TPU: python -u scripts/bench_train_probe.py
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
from ggnn_tpu.models import ModelConfig, init_params
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
    batch = synthetic_batch(262_144, 4_000_000, T, annotation_dim=8, seed=0,
                            node_mult=128, n_communities=512, p_intra=0.95)
    N = batch.spec.n_pad
    cfg = ModelConfig(state_dim=D, annotation_dim=8, n_edge_types=T,
                      compute_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(1), cfg)
    msg_w = params["prop"]["msg_w"].astype(jnp.bfloat16)
    msg_b = params["prop"]["msg_b"].astype(jnp.bfloat16)
    h0 = jax.random.normal(jax.random.PRNGKey(2), (N, D), dtype=jnp.float32)

    lays = {}
    for rm in ("src", "block"):
        lays[rm] = wp.build_window_layout(
            batch.edge_src, batch.edge_dst, batch.edge_type, batch.edge_mask,
            N, window=W, n_message_types=T2, block_rows=BR, with_grad=True,
            row_major=rm)

    @functools.partial(jax.jit, static_argnames=("k",))
    def vg_chain(h, lay, k):
        def body(i, carry):
            h, tot = carry

            def loss(hh):
                a = wp.aggregate_window(hh.astype(jnp.bfloat16), lay, msg_w,
                                        msg_b, interpret=False)
                return jnp.sum(a * a)

            l, g = jax.value_and_grad(loss)(h)
            h = h + 1e-30 * g
            return h, tot + l
        _, tot = jax.lax.fori_loop(0, k, body, (h, jnp.float32(0)))
        return tot

    for rm in ("src", "block"):
        diff_chain(f"agg value_and_grad [{rm}]", vg_chain, h0, lays[rm])

    # standalone backward reduction einsums
    R = T2 * N
    Y = jax.random.normal(jax.random.PRNGKey(3), (R, D), dtype=jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("k", "form"))
    def bchain(Y, h, k, form):
        hb = h.astype(jnp.bfloat16)

        def body(i, carry):
            Y, tot = carry
            if form == "src":
                Yr = Y.reshape(N, T2, D)
                dh = jnp.einsum("ntf,tdf->nd", Yr, msg_w,
                                preferred_element_type=jnp.float32)
                dW = jnp.einsum("nd,ntf->tdf", hb, Yr,
                                preferred_element_type=jnp.float32)
            else:
                Yb = Y.reshape(N // 128, T2, 128, D)
                dh = jnp.einsum("btsf,tdf->bsd", Yb, msg_w,
                                preferred_element_type=jnp.float32)
                dW = jnp.einsum("bsd,btsf->tdf",
                                hb.reshape(N // 128, 128, D), Yb,
                                preferred_element_type=jnp.float32)
            s = dh[0, 0, 0] if dh.ndim == 3 else dh[0, 0]
            s = s + dW[0, 0, 0]
            Y = Y.at[0, 0].set(Y[0, 0] + (1e-30 * s).astype(Y.dtype))
            return Y, tot + s
        _, tot = jax.lax.fori_loop(0, k, body, (Y, jnp.float32(0)))
        return tot

    for form in ("src", "block"):
        diff_chain(f"bwd einsums [{form}]",
                   functools.partial(bchain, form=form), Y, h0)


if __name__ == "__main__":
    main()
