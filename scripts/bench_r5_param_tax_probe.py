#!/usr/bin/env python
"""Round-8 (VERDICT r4 #4): close the param-cotangent tax accounting.

Round 7 measured vg-wrt-params ~4 ms/prop-step over vg-wrt-h with only
~1.3 ms attributed (Hsp gather + dW_sp/db einsums).  This probe
attributes the whole tax by differentiating wrt PARAM SUBSETS — each
delta against vg_h is exactly the cost of that parameter's cotangent
terms (XLA dead-code-eliminates the rest):

  vg_h        grad wrt h only (baseline)
  vg_h_msgb   + msg_b        -> the gt_indeg db einsum
  vg_h_msgw   + msg_w        -> dWt use + spill dW_sp + Hsp gather
  vg_h_gru    + gru weights  -> GRU param grads (dwa/db3/duzr/duh)
  vg_all      everything     -> leftover vs the sum of deltas =
                                scheduling / fusion interference
  scan5       a REAL lax.scan over T=5 with param-grad accumulation
              (the train-shaped program) -> scan-stacking term =
              scan5/5 - vg_all

Config = community train headline (262K/8M, 512 comms, br=512, W=512,
on_demand, bf16, fused step).  Run ON THE TPU.
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
from ggnn_tpu.ops import window_pallas as wp

INTERP = jax.default_backend() != "tpu"
K = 5
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
    cfg = ModelConfig(state_dim=D, annotation_dim=8, n_edge_types=8,
                      compute_dtype="bfloat16", backend="window",
                      fuse_gru=True)
    params = init_params(jax.random.PRNGKey(1), cfg)
    gru = params["prop"]["gru"]
    msg_w = params["prop"]["msg_w"].astype(jnp.bfloat16)
    msg_b = params["prop"]["msg_b"].astype(jnp.bfloat16)

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
    meta = lay.meta
    N = batch.spec.n_pad
    h0 = jax.random.normal(jax.random.PRNGKey(2), (N, D), jnp.float32)
    print(f"N={N} E={E_DIR}", flush=True)

    def step(h, mw, mb, g):
        lay_k = wp.DeviceWindowLayout(meta=meta, arrays=arrs_g[0])
        return wp.gru_window_step(h, lay_k, mw, mb, g, interpret=INTERP)

    arrs_g = [None]

    def mk_vg(wrt):
        """wrt ⊆ {'h','msg_w','msg_b','gru'} — value_and_grad of
        sum(step^2) wrt those leaves (everything else held constant)."""
        @functools.partial(jax.jit, static_argnames=("k",))
        def run(h, arrs_, mw, mb, g, k):
            arrs_g[0] = arrs_

            def loss(dh, dmw, dmb, dg):
                hh = h + dh if "h" in wrt else h
                w = mw + dmw if "msg_w" in wrt else mw
                b = mb + dmb if "msg_b" in wrt else mb
                gg = ({k2: v + dg[k2] for k2, v in g.items()}
                      if "gru" in wrt else g)
                hn = step(hh, w, b, gg)
                return jnp.sum(hn * hn)

            z = (jnp.zeros_like(h), jnp.zeros_like(mw),
                 jnp.zeros_like(mb),
                 jax.tree.map(jnp.zeros_like, g))
            argn = tuple(i for i, name in
                         enumerate(("h", "msg_w", "msg_b", "gru"))
                         if name in wrt)

            def body(i, carry):
                # loop-carried dep: perturb every delta by a data-
                # dependent zero; reduce every grad leaf into the carry
                zz = jax.tree.map(
                    lambda x: x + (carry * 1e-30).astype(x.dtype), z)
                s, gr = jax.value_and_grad(loss, argnums=argn)(*zz)
                acc = s * 1e-30
                for l_ in jax.tree.leaves(gr):
                    acc = acc + jnp.sum(l_) * 1e-30
                return carry * 0 + acc
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return run

    print(f"device: {jax.devices()[0]}", flush=True)
    only = os.environ.get("PROBE_ONLY")
    only = set(only.split(",")) if only else None
    r = {}
    cases = [
        ("vg_h", ("h",)),
        ("vg_h_msgb", ("h", "msg_b")),
        ("vg_h_msgw", ("h", "msg_w")),
        ("vg_h_gru", ("h", "gru")),
        ("vg_all", ("h", "msg_w", "msg_b", "gru")),
    ]
    for tag, wrt in cases:
        if only is not None and tag not in only:
            continue
        run = mk_vg(wrt)
        r[tag] = diff(
            tag,
            lambda run=run: float(run(h0, lay.arrays, msg_w, msg_b, gru,
                                      k=1)),
            lambda run=run: float(run(h0, lay.arrays, msg_w, msg_b, gru,
                                      k=K)))

    # scan5: the real train-shaped program (scan over T with param-grad
    # accumulation across steps)
    if only is None or "scan5" in only:
        @functools.partial(jax.jit, static_argnames=("k",))
        def scan5(h, arrs_, mw, mb, g, k):
            arrs_g[0] = arrs_

            def loss(mw_, mb_, g_):
                def body(hh, _):
                    hn = step(hh, mw_, mb_, g_)
                    return hn, None
                hT, _ = jax.lax.scan(body, h, None, length=5)
                return jnp.sum(hT * hT)

            def outer(i, carry):
                mw_ = mw + (carry * 1e-30).astype(mw.dtype)
                s, gr = jax.value_and_grad(loss, argnums=(0, 1, 2))(
                    mw_, mb, g)
                return carry * 0 + s * 1e-30 + jnp.sum(
                    jnp.stack([jnp.sum(l_) * 1e-30
                               for l_ in jax.tree.leaves(gr)]))
            return jax.lax.fori_loop(0, k, outer, jnp.float32(0))

        t1 = timeit(lambda: float(scan5(h0, lay.arrays, msg_w, msg_b,
                                        gru, k=1)), "scan5 k=1")
        t2 = timeit(lambda: float(scan5(h0, lay.arrays, msg_w, msg_b,
                                        gru, k=2)), "scan5 k=2")
        per = t2 - t1
        if per <= 0:
            per = t2 / 2
        r["scan5_per_step"] = per / 5
        print(f"scan5: {per * 1e3:.2f} ms / 5 steps = "
              f"{per / 5 * 1e3:.2f} ms/step", flush=True)

    print("\n=== param-cotangent accounting (ms/prop-step) ===",
          flush=True)
    if "vg_h" in r:
        base = r["vg_h"]
        for tag in ("vg_h_msgb", "vg_h_msgw", "vg_h_gru", "vg_all"):
            if tag in r:
                print(f"  {tag:10s} {r[tag] * 1e3:8.2f}  "
                      f"(+{(r[tag] - base) * 1e3:6.2f} vs vg_h)",
                      flush=True)
        if {"vg_h_msgb", "vg_h_msgw", "vg_h_gru", "vg_all"} <= set(r):
            s = sum(r[t] - base for t in
                    ("vg_h_msgb", "vg_h_msgw", "vg_h_gru"))
            print(f"  sum of deltas {s * 1e3:6.2f}; vg_all delta "
                  f"{(r['vg_all'] - base) * 1e3:6.2f}; interference "
                  f"{(r['vg_all'] - base - s) * 1e3:6.2f}", flush=True)
        if "scan5_per_step" in r and "vg_all" in r:
            print(f"  scan-stacking term {'':2s}"
                  f"{(r['scan5_per_step'] - r['vg_all']) * 1e3:6.2f} "
                  f"(scan5/step {r['scan5_per_step'] * 1e3:.2f} - vg_all "
                  f"{r['vg_all'] * 1e3:.2f})", flush=True)


if __name__ == "__main__":
    main()
