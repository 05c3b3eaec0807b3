#!/usr/bin/env python
"""Round-4 part 3: is the scan-context backward slowdown (33.7 ms/step
in a T=5 scan vs 24.5 ms differentiated in isolation) a FIXED cost at
backward entry or a MARGINAL per-step cost?  vg over T-step scans for
T in (1, 2, 5): fixed = intercept, marginal = slope.

Run ON THE TPU: python -u scripts/bench_r4_scanT_probe.py
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
from ggnn_tpu.models.ggnn import propagate
from ggnn_tpu.ops import window_pallas as wp

INTERP = jax.default_backend() != "tpu"
K = 3


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
    nn, ee, nc, br, win = ((2048, 32768, 16, 128, 128) if small
                           else (262_144, 4_000_000, 512, 512, 512))
    batch = synthetic_batch(nn, ee, 8, annotation_dim=8, seed=0,
                            node_mult=128, n_communities=nc, p_intra=0.95)
    lay = wp.build_window_layout(
        batch.edge_src, batch.edge_dst, batch.edge_type, batch.edge_mask,
        batch.spec.n_pad, window=win, n_message_types=16, block_rows=br,
        with_grad=True, typed_spill=True, on_demand=True,
        row_major="block")
    ann = jnp.asarray(batch.annotations)
    ops = (jnp.asarray(batch.edge_src), jnp.asarray(batch.edge_dst),
           jnp.asarray(batch.edge_type), jnp.asarray(batch.edge_mask),
           jnp.asarray(batch.type_offsets))

    print(f"device: {jax.devices()[0]}", flush=True)
    res = {}
    for T in (1, 2, 5):
        cfg = ModelConfig(state_dim=D, annotation_dim=8, n_edge_types=8,
                          n_steps=T, compute_dtype="bfloat16",
                          backend="window", fuse_gru=True)
        params = init_params(jax.random.PRNGKey(0), cfg)
        prop0 = params["prop"]

        @functools.partial(jax.jit, static_argnames=("k",))
        def vg(prop, ann, es, ed, et, em, to, lay_, k, cfg=cfg):
            def body(carry, _):
                prop, acc = carry

                def loss_fn(p):
                    h = propagate(p, cfg, ann, es, ed, et, em,
                                  type_offsets=to, scatter_layout=lay_)
                    return jnp.sum(h * h)
                loss, grads = jax.value_and_grad(loss_fn)(prop)
                prop = jax.tree.map(lambda p, g: p + 1e-30 * g, prop,
                                    grads)
                return (prop, acc + loss), None
            (prop, acc), _ = jax.lax.scan(body, (prop, jnp.float32(0)),
                                          None, length=k)
            return acc

        res[T] = diff(f"vg T={T}",
                      lambda: float(vg(prop0, ann, *ops, lay, k=1)),
                      lambda: float(vg(prop0, ann, *ops, lay, k=K)))

    print("\n=== summary ===", flush=True)
    for T, v in res.items():
        print(f"  T={T}: {v * 1e3:8.2f} ms/iter "
              f"({v * 1e3 / T:.2f} ms/prop-step)", flush=True)
    m52 = (res[5] - res[2]) / 3
    m21 = res[2] - res[1]
    print(f"  marginal step (T5-T2)/3 = {m52 * 1e3:.2f} ms; T2-T1 = "
          f"{m21 * 1e3:.2f} ms; intercept ~ "
          f"{(res[1] - m52) * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
