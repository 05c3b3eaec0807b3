#!/usr/bin/env python
"""Round-8 refreshed uniform-TRAIN floor decomposition (VERDICT r4 #2):
after the per-block forward scatter and the octet grad kernel landed
(127.1M vs the flat ~105M), where does the step stand against its
floors?

Components (chain-differenced):
  fwd5 / vg5      5-step fused fwd / full train (the bench quantities)
  gather          one h_pack gather (engine floor term, ~15.3 ms r7)
  g_gather        the grad pack gather (da rows, same engine)
  rev_scatter     _typed_reverse_scatter whole (g_gather + octet kernel)
  gru_bwd         gru_cell_bwd alone

Run ON THE TPU: python -u scripts/bench_r5_uniform_train_probe.py
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
from ggnn_tpu.ops import scatter_pallas as sp
from ggnn_tpu.ops.gru_pallas import gru_cell_bwd

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
    gru = prop0["gru"]
    wa = jnp.concatenate([gru["wz"], gru["wr"], gru["wh"]], axis=1)
    uzr = jnp.concatenate([gru["uz"], gru["ur"]], axis=1)
    batch = synthetic_batch(nn, ee, 8, annotation_dim=8, seed=0,
                            node_mult=128)
    E_DIR = int(batch.edge_mask.sum())
    lay = sp.build_typed_dst_layout(
        batch.edge_src, batch.edge_dst, batch.edge_type, batch.edge_mask,
        batch.spec.n_pad, n_message_types=16, with_grad=True)
    assert lay.meta[10] is not None and lay.meta[5][0] == "octet"
    ann = jnp.asarray(batch.annotations)
    ops = (jnp.asarray(batch.edge_src), jnp.asarray(batch.edge_dst),
           jnp.asarray(batch.edge_type), jnp.asarray(batch.edge_mask),
           jnp.asarray(batch.type_offsets))
    N = batch.spec.n_pad
    T2 = 16
    gidx = lay.arrays["gather_idx"]
    ggidx = lay.arrays["g_gather_idx"]
    print(f"N={N} E={E_DIR} pack={gidx.shape[0]} gpack={ggidx.shape[0]} "
          f"octet_meta={lay.meta[5]}", flush=True)

    @functools.partial(jax.jit, static_argnames=("k",))
    def fwd5(prop, ann, es, ed, et, em, to, arrs_, k):
        lay_ = sp.DeviceScatterLayout(meta=lay.meta, arrays=arrs_)

        def body(h, _):
            h = propagate(prop, cfg, ann, es, ed, et, em, type_offsets=to,
                          scatter_layout=lay_, h0=h)
            return h, None
        h0 = init_state(ann, D)
        h, _ = jax.lax.scan(body, h0, None, length=k)
        return jnp.sum(h)

    @functools.partial(jax.jit, static_argnames=("k",))
    def vg5(prop, ann, es, ed, et, em, to, arrs_, k):
        lay_ = sp.DeviceScatterLayout(meta=lay.meta, arrays=arrs_)

        def body(carry, _):
            prop, acc = carry

            def loss_fn(p):
                h = propagate(p, cfg, ann, es, ed, et, em,
                              type_offsets=to, scatter_layout=lay_)
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

    @functools.partial(jax.jit, static_argnames=("k",))
    def rev_scatter(da, arrs_, k):
        def body(i, da):
            Y = sp._typed_reverse_scatter(lay.meta, INTERP, arrs_, da, T2,
                                          N, D, out_dtype=jnp.bfloat16)
            return da * 0 + Y[:N].astype(jnp.float32) \
                + 1e-30 * jnp.sum(Y[:1])
        da = jax.lax.fori_loop(0, k, body, da)
        return jnp.sum(da)

    h0 = jax.random.normal(jax.random.PRNGKey(1), (N, D), jnp.float32)
    da0 = jax.random.normal(jax.random.PRNGKey(2), (N, D), jnp.float32)
    hc = h0.astype(jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("k",))
    def grub(g, hc, k):
        a = hc
        z = hc * 0.5
        r = hc * 0.5
        htil = hc

        def body(i, g):
            dh1, da, dwa, db3_, duzr, duh = gru_cell_bwd(
                g, hc, a, z, r, htil, wa, uzr, gru["uh"], mdt="bfloat16",
                interpret=INTERP)
            return g * 0 + dh1 + 1e-30 * da[0, 0]
        g = jax.lax.fori_loop(0, k, body, g)
        return jnp.sum(g)

    print(f"device: {jax.devices()[0]}", flush=True)
    only = os.environ.get("PROBE_ONLY")
    only = set(only.split(",")) if only else None
    r = {}

    def run(tag, f1, fk, k=K):
        if only is None or tag in only:
            r[tag] = diff(tag, f1, fk, k=k)

    run("fwd5", lambda: float(fwd5(prop0, ann, *ops, lay.arrays, k=1)),
        lambda: float(fwd5(prop0, ann, *ops, lay.arrays, k=K)))
    run("vg5", lambda: float(vg5(prop0, ann, *ops, lay.arrays, k=1)),
        lambda: float(vg5(prop0, ann, *ops, lay.arrays, k=K)))
    run("gather", lambda: float(gather(h0, gidx, k=1)),
        lambda: float(gather(h0, gidx, k=5)), k=5)
    run("g_gather", lambda: float(gather(da0, ggidx, k=1)),
        lambda: float(gather(da0, ggidx, k=5)), k=5)
    run("rev_scatter",
        lambda: float(rev_scatter(da0, lay.arrays, k=1)),
        lambda: float(rev_scatter(da0, lay.arrays, k=K)))
    run("gru_bwd", lambda: float(grub(da0, hc, k=1)),
        lambda: float(grub(da0, hc, k=K)))

    print("\n=== summary ===", flush=True)
    if {"fwd5", "vg5"} <= set(r):
        print(f"  fwd/step {r['fwd5'] * 1e3 / 5:.2f} ms; train/step "
              f"{r['vg5'] * 1e3 / 5:.2f} ms; train rate "
              f"{E_DIR * 5 / r['vg5'] / 1e6:.1f}M edges/s", flush=True)
    for tag in ("gather", "g_gather", "rev_scatter", "gru_bwd"):
        if tag in r:
            print(f"  {tag:12s} {r[tag] * 1e3:8.2f} ms", flush=True)
    if {"rev_scatter", "g_gather"} <= set(r):
        print(f"  octet kernel alone ~ "
              f"{(r['rev_scatter'] - r['g_gather']) * 1e3:.2f} ms "
              f"(rev_scatter - g_gather)", flush=True)


if __name__ == "__main__":
    main()
