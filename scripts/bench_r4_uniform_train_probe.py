#!/usr/bin/env python
"""Round-7: decompose the uniform 262K TRAIN path (flat at ~105M for
two rounds — VERDICT r3 weak #6) to certify it is gather-ENGINE-bound
at the fast (under-cliff) rate, i.e. already at its floor.

  fwd5     T=5 onehot typed-pack serving propagate
  vg5      value_and_grad wrt params, T=5
  gather   the h_pack gather alone (8.3M aligned rows from the 67 MB
           h buffer, hard-dep chained) — the predicted dominant term
  ggather  the grad-side da gather alone (same row count, bf16)

Run ON THE TPU: python -u scripts/bench_r4_uniform_train_probe.py
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
from ggnn_tpu.models.ggnn import init_state, propagate
from ggnn_tpu.ops.scatter_pallas import build_typed_dst_layout

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


def diff(tag, f1, fk, k=K):
    t1 = timeit(f1, tag + " k=1")
    tk = timeit(fk, tag + f" k={k}")
    per = (tk - t1) / (k - 1)
    if per <= 0:
        per = tk / k
    print(f"{tag}: {per * 1e3:.2f} ms/iter", flush=True)
    return per


def main():
    global E_DIR
    small = os.environ.get("PROBE_SMALL") == "1"
    D = 128
    nn, ee = (2048, 32768) if small else (262_144, 4_000_000)
    cfg = ModelConfig(state_dim=D, annotation_dim=8, n_edge_types=8,
                      n_steps=5, compute_dtype="bfloat16",
                      backend="onehot", fuse_gru=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    prop0 = params["prop"]
    batch = synthetic_batch(nn, ee, 8, annotation_dim=8, seed=0,
                            node_mult=128)
    E_DIR = int(batch.edge_mask.sum())
    lay = build_typed_dst_layout(
        batch.edge_src, batch.edge_dst, batch.edge_type, batch.edge_mask,
        batch.spec.n_pad, n_message_types=16, with_grad=True)
    ann = jnp.asarray(batch.annotations)
    ops = (jnp.asarray(batch.edge_src), jnp.asarray(batch.edge_dst),
           jnp.asarray(batch.edge_type), jnp.asarray(batch.edge_mask),
           jnp.asarray(batch.type_offsets))
    N = batch.spec.n_pad
    gidx = jnp.asarray(np.asarray(lay.arrays["gather_idx"]))
    n_pack = gidx.shape[0]
    print(f"N={N} E={E_DIR} pack_rows={n_pack} "
          f"h={N * D * 2 / 1e6:.0f}MB", flush=True)

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
            prop = jax.tree.map(lambda p, g: p + 1e-30 * g, prop, grads)
            return (prop, acc + loss), None
        (prop, acc), _ = jax.lax.scan(body, (prop, jnp.float32(0)), None,
                                      length=k)
        return acc

    @functools.partial(jax.jit, static_argnames=("k",))
    def gather(h, idx, k):
        def body(i, acc):
            zero = (acc[0, 0] * 1e-30).astype(idx.dtype)
            g = h.astype(jnp.bfloat16)[idx + zero]
            return acc + g[:8].astype(jnp.float32)
        acc = jax.lax.fori_loop(0, k, body, jnp.zeros((8, D), jnp.float32))
        return jnp.sum(acc)

    h0 = jax.random.normal(jax.random.PRNGKey(1), (N, D), jnp.float32)

    print(f"device: {jax.devices()[0]}", flush=True)
    r = {}
    r["fwd5"] = diff("fwd5",
                     lambda: float(fwd5(prop0, ann, *ops, lay, k=1)),
                     lambda: float(fwd5(prop0, ann, *ops, lay, k=K)))
    r["vg5"] = diff("vg5",
                    lambda: float(vg5(prop0, ann, *ops, lay, k=1)),
                    lambda: float(vg5(prop0, ann, *ops, lay, k=K)))
    r["gather"] = diff("gather (h_pack rows)",
                       lambda: float(gather(h0, gidx, k=1)),
                       lambda: float(gather(h0, gidx, k=5)), k=5)

    print("\n=== summary ===", flush=True)
    print(f"  fwd/step {r['fwd5'] * 1e3 / 5:.2f} ms; fwd+bwd/step "
          f"{r['vg5'] * 1e3 / 5:.2f} ms; one h_pack gather "
          f"{r['gather'] * 1e3:.2f} ms "
          f"({r['gather'] / n_pack * 1e9:.2f} ns/row)", flush=True)
    print(f"  gather share of fwd: "
          f"{r['gather'] * 5 / r['fwd5'] * 100:.0f}%  (bwd re-gathers "
          f"grad packs at the same rate)", flush=True)
    print(f"  train rate: {E_DIR * 5 / r['vg5'] / 1e6:.1f}M edges/s",
          flush=True)


if __name__ == "__main__":
    main()
