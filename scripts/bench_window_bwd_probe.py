#!/usr/bin/env python
"""Isolate the window-backend BACKWARD cost (train bench: fwd 25 ms/step
but fwd+bwd ~124 ms/step).  Chained-differenced value_and_grad of one
aggregation, with and without a spill population.

Run ON THE TPU: python -u scripts/bench_window_bwd_probe.py > /tmp/wbwd.txt
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
    D = 128
    cfg = ModelConfig(state_dim=D, annotation_dim=8, n_edge_types=8,
                      compute_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(1), cfg)
    msg_w = params["prop"]["msg_w"].astype(jnp.bfloat16)
    msg_b = params["prop"]["msg_b"].astype(jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("k", "mode"))
    def chain(h, lay, k, mode):
        def loss(h):
            out = wp.aggregate_window(h.astype(jnp.bfloat16), lay, msg_w,
                                      msg_b, interpret=False)
            return jnp.sum(out * out)

        def body(i, carry):
            h, tot = carry
            if mode == "fwd":
                s = loss(h)
            else:
                s, g = jax.value_and_grad(loss)(h)
                s = s + g[0, 0]
            h = h.at[0, 0].set(h[0, 0] + 1e-30 * s)
            return h, tot + s
        _, tot = jax.lax.fori_loop(0, k, body, (h, jnp.float32(0)))
        return tot

    for p_intra, tag in ((1.0, "no-spill"), (0.95, "5%-spill")):
        batch = synthetic_batch(262_144, 4_000_000, 8, annotation_dim=8,
                                seed=0, node_mult=128, n_communities=512,
                                p_intra=p_intra)
        lay = wp.build_window_layout(batch.edge_src, batch.edge_dst,
                                     batch.edge_type, batch.edge_mask,
                                     batch.spec.n_pad, window=512,
                                     n_message_types=16, with_grad=True)
        print(f"{tag}: {lay.stats}", flush=True)
        h = jax.random.normal(jax.random.PRNGKey(2),
                              (batch.spec.n_pad, D), dtype=jnp.float32)
        for mode in ("fwd", "grad"):
            t1 = timeit(lambda: float(chain(h, lay, k=1, mode=mode)),
                        tag=f"{tag} {mode} k=1")
            t9 = timeit(lambda: float(chain(h, lay, k=9, mode=mode)),
                        tag=f"{tag} {mode} k=9")
            print(f"  => {tag} {mode}: {(t9 - t1) / 8 * 1e3:.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
