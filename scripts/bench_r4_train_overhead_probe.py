#!/usr/bin/env python
"""Part 2 of the round-4 train decomposition: reconcile the per-step
probe (24.54 ms fwd+bwd, bench_r4_bwd_probe) with the end-to-end train
rate (269.4M => 148.4 ms/iter at T=5).  The ~26 ms/iter gap is either
optimizer/glue overhead or a stale baseline.

  fwd5        T=5 serving propagate (no grad)
  vg5         value_and_grad wrt PARAMS of the T=5 propagate
  train_iter  vg5 + optax Adam update (the bench train body, exactly)

vg5 - fwd5 = total backward; train_iter - vg5 = optimizer tax.

Run ON THE TPU: python -u scripts/bench_r4_train_overhead_probe.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

from ggnn_tpu.data.synthetic import synthetic_batch
from ggnn_tpu.models import ModelConfig, init_params
from ggnn_tpu.models.ggnn import init_state, propagate
from ggnn_tpu.ops import window_pallas as wp

INTERP = jax.default_backend() != "tpu"
K = 3
E_DIR = None


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
    rate = E_DIR * 5 / per
    print(f"{tag}: {per * 1e3:.2f} ms/iter  ({rate / 1e6:.1f}M edges/s "
          f"at T=5)", flush=True)
    return per


def main():
    global E_DIR
    small = os.environ.get("PROBE_SMALL") == "1"
    D = 128
    cfg = ModelConfig(state_dim=D, annotation_dim=8, n_edge_types=8,
                      n_steps=5, compute_dtype="bfloat16",
                      backend="window", fuse_gru=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    prop0 = params["prop"]

    nn, ee, nc, br, win = ((2048, 32768, 16, 128, 128) if small
                           else (262_144, 4_000_000, 512, 512, 512))
    batch = synthetic_batch(nn, ee, 8, annotation_dim=8, seed=0,
                            node_mult=128, n_communities=nc, p_intra=0.95)
    E_DIR = int(batch.edge_mask.sum())
    lay = wp.build_window_layout(
        batch.edge_src, batch.edge_dst, batch.edge_type, batch.edge_mask,
        batch.spec.n_pad, window=win, n_message_types=16, block_rows=br,
        with_grad=True, typed_spill=True, on_demand=True,
        row_major="block")
    print(f"layout: {lay.stats}", flush=True)
    ann = jnp.asarray(batch.annotations)
    ops = (jnp.asarray(batch.edge_src), jnp.asarray(batch.edge_dst),
           jnp.asarray(batch.edge_type), jnp.asarray(batch.edge_mask),
           jnp.asarray(batch.type_offsets))
    optimizer = optax.adam(1e-3)
    opt_state0 = optimizer.init(prop0)

    @functools.partial(jax.jit, static_argnames=("k",))
    def fwd5(prop, ann, es, ed, et, em, to, lay_, k):
        def body(h, _):
            h = propagate(prop, cfg, ann, es, ed, et, em, type_offsets=to,
                          scatter_layout=lay_, h0=h)
            return h, None
        h0 = init_state(ann, D)
        h, _ = jax.lax.scan(body, h0, None, length=k)
        return jnp.sum(h)

    @functools.partial(jax.jit, static_argnames=("k",))
    def vg5(prop, ann, es, ed, et, em, to, lay_, k):
        def body(carry, _):
            prop, acc = carry

            def loss_fn(p):
                h = propagate(p, cfg, ann, es, ed, et, em, type_offsets=to,
                              scatter_layout=lay_)
                return jnp.sum(h * h)
            loss, grads = jax.value_and_grad(loss_fn)(prop)
            # dependency: fold a hair of the grads back into the params
            prop = jax.tree.map(lambda p, g: p + 1e-30 * g, prop, grads)
            return (prop, acc + loss), None
        (prop, acc), _ = jax.lax.scan(body, (prop, jnp.float32(0)), None,
                                      length=k)
        return acc

    @functools.partial(jax.jit, static_argnames=("k",))
    def train_iter(prop, opt_state, ann, es, ed, et, em, to, lay_, k):
        def body2(carry, _):
            prop, opt_state = carry

            def loss_fn(p):
                h = propagate(p, cfg, ann, es, ed, et, em, type_offsets=to,
                              scatter_layout=lay_)
                return jnp.sum(h * h)
            loss, grads = jax.value_and_grad(loss_fn)(prop)
            updates, opt_state = optimizer.update(grads, opt_state, prop)
            prop = optax.apply_updates(prop, updates)
            return (prop, opt_state), loss
        (prop, opt_state), losses = jax.lax.scan(
            body2, (prop, opt_state), None, length=k)
        return losses[-1]

    print(f"device: {jax.devices()[0]}", flush=True)
    r = {}
    r["train_iter"] = diff(
        "train_iter",
        lambda: float(train_iter(prop0, opt_state0, ann, *ops, lay, k=1)),
        lambda: float(train_iter(prop0, opt_state0, ann, *ops, lay, k=K)))
    r["vg5"] = diff(
        "vg5", lambda: float(vg5(prop0, ann, *ops, lay, k=1)),
        lambda: float(vg5(prop0, ann, *ops, lay, k=K)))
    r["fwd5"] = diff(
        "fwd5", lambda: float(fwd5(prop0, ann, *ops, lay, k=1)),
        lambda: float(fwd5(prop0, ann, *ops, lay, k=K)))

    print("\n=== summary (ms/iter at T=5) ===", flush=True)
    for k, v in r.items():
        print(f"  {k:12s} {v * 1e3:8.2f}", flush=True)
    print(f"  optimizer tax {(r['train_iter'] - r['vg5']) * 1e3:8.2f}",
          flush=True)
    print(f"  backward tot  {(r['vg5'] - r['fwd5']) * 1e3:8.2f}",
          flush=True)
    print(f"  per prop-step fwd {r['fwd5'] * 1e3 / 5:.2f}  fwd+bwd "
          f"{r['vg5'] * 1e3 / 5:.2f}", flush=True)


if __name__ == "__main__":
    main()
