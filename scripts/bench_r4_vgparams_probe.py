#!/usr/bin/env python
"""Round-4 part 4: pin the ~6 ms/step gap between the isolated h-vg of
the fused step (24.5 ms, bench_r4_bwd_probe) and the params-vg through
propagate() (30.7 ms at T=1, bench_r4_scanT_probe).

  vg_h        value_and_grad wrt h of gru_window_step       (= part 1)
  vg_hp       value_and_grad wrt (h, msg_w, msg_b, gru) of the same
  vg_prop     value_and_grad wrt params of propagate() T=1  (= part 3)

If vg_hp ~= vg_h: the gap is in propagate()'s wrapper; if vg_hp ~=
vg_prop: materializing param cotangents costs ~6 ms (XLA no longer
DCEs the dW-side work).

Run ON THE TPU: python -u scripts/bench_r4_vgparams_probe.py
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
    cfg = ModelConfig(state_dim=D, annotation_dim=8, n_edge_types=8,
                      n_steps=1, compute_dtype="bfloat16",
                      backend="window", fuse_gru=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    prop0 = params["prop"]
    gru = prop0["gru"]
    msg_w = prop0["msg_w"].astype(jnp.bfloat16)
    msg_b = prop0["msg_b"].astype(jnp.bfloat16)

    nn, ee, nc, br, win = ((2048, 32768, 16, 128, 128) if small
                           else (262_144, 4_000_000, 512, 512, 512))
    batch = synthetic_batch(nn, ee, 8, annotation_dim=8, seed=0,
                            node_mult=128, n_communities=nc, p_intra=0.95)
    lay = wp.build_window_layout(
        batch.edge_src, batch.edge_dst, batch.edge_type, batch.edge_mask,
        batch.spec.n_pad, window=win, n_message_types=16, block_rows=br,
        with_grad=True, typed_spill=True, on_demand=True,
        row_major="block")
    meta, arrs = lay.meta, lay.arrays
    N = batch.spec.n_pad
    ann = jnp.asarray(batch.annotations)
    ops = (jnp.asarray(batch.edge_src), jnp.asarray(batch.edge_dst),
           jnp.asarray(batch.edge_type), jnp.asarray(batch.edge_mask),
           jnp.asarray(batch.type_offsets))
    h0 = jax.random.normal(jax.random.PRNGKey(2), (N, D), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("k",))
    def vg_h(h, arrs_, k):
        lay_k = wp.DeviceWindowLayout(meta=meta, arrays=arrs_)

        def loss(hh):
            hn = wp.gru_window_step(hh, lay_k, msg_w, msg_b, gru,
                                    interpret=INTERP)
            return jnp.sum(hn * hn)

        def body(i, h):
            s, g = jax.value_and_grad(loss)(h)
            return h * 0 + g + 1e-30 * s
        h = jax.lax.fori_loop(0, k, body, h)
        return jnp.sum(h)

    @functools.partial(jax.jit, static_argnames=("k",))
    def vg_hp(h, mw, mb, gru_, arrs_, k):
        lay_k = wp.DeviceWindowLayout(meta=meta, arrays=arrs_)

        def loss(hh, mw_, mb_, g_):
            hn = wp.gru_window_step(hh, lay_k, mw_, mb_, g_,
                                    interpret=INTERP)
            return jnp.sum(hn * hn)

        def body(i, carry):
            h, mw_, mb_, g_ = carry
            s, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
                h, mw_, mb_, g_)
            h = h * 0 + grads[0] + 1e-30 * s
            mw_ = mw_ + 1e-30 * grads[1].astype(mw_.dtype)
            mb_ = mb_ + 1e-30 * grads[2].astype(mb_.dtype)
            g_ = jax.tree.map(lambda a, b: a + 1e-30 * b.astype(a.dtype),
                              g_, grads[3])
            return (h, mw_, mb_, g_)
        h, mw, mb, gru_ = jax.lax.fori_loop(0, k, body, (h, mw, mb, gru_))
        return jnp.sum(h)

    @functools.partial(jax.jit, static_argnames=("k",))
    def vg_prop(prop, ann, es, ed, et, em, to, lay_, k):
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

    print(f"device: {jax.devices()[0]}", flush=True)
    r = {}
    r["vg_h"] = diff("vg_h",
                     lambda: float(vg_h(h0, arrs, k=1)),
                     lambda: float(vg_h(h0, arrs, k=K)))
    r["vg_hp"] = diff(
        "vg_hp",
        lambda: float(vg_hp(h0, msg_w, msg_b, gru, arrs, k=1)),
        lambda: float(vg_hp(h0, msg_w, msg_b, gru, arrs, k=K)))
    r["vg_prop"] = diff(
        "vg_prop",
        lambda: float(vg_prop(prop0, ann, *ops, lay, k=1)),
        lambda: float(vg_prop(prop0, ann, *ops, lay, k=K)))

    print("\n=== summary (ms/iter) ===", flush=True)
    for kk, v in r.items():
        print(f"  {kk:8s} {v * 1e3:8.2f}", flush=True)


if __name__ == "__main__":
    main()
