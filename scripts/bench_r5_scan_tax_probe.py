#!/usr/bin/env python
"""Round-8: isolate the uniform-train SCAN-CONTEXT tax (71.2 ms/step in
a T>=2 scan vs 54.5 isolated single-step — 16.7 ms/step, flat in T).

Hypotheses:
  H1 lax.scan machinery (stacking dynamic-slices, loop overhead)
     -> inline 2-step composition (no scan) should cost ~2x single.
  H2 step COMPOSITION: step k+1's h_pack gather reads an h that is the
     previous step's fused elementwise output (cast/fusion/layout) —
     the gather slows on a computed operand
     -> inline 2-step should cost ~(single + single + tax).

  vg1          single-step value_and_grad (control, ~54.5)
  vg2_inline   two steps composed INLINE in one jit, no scan
  vg2_scan     two steps under lax.scan
  vg1_batchedh single-step but h materialized THROUGH one untimed
               fwd step outside (rules out input-layout effects)

Run ON THE TPU: python -u scripts/bench_r5_scan_tax_probe.py
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
from ggnn_tpu.models.ggnn import propagate
from ggnn_tpu.ops import scatter_pallas as sp

INTERP = jax.default_backend() != "tpu"
K = 5
D = 128


def timeit(fn, tag, iters=3, warmup=1):
    fn()
    for _ in range(warmup):
        fn()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"  {tag}: {best * 1e3:.2f} ms", flush=True)
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
    small = os.environ.get("PROBE_SMALL") == "1"
    nn, ee = (2048, 32768) if small else (262_144, 4_000_000)
    params = init_params(jax.random.PRNGKey(0),
                         ModelConfig(state_dim=D, annotation_dim=8,
                                     n_edge_types=8))
    prop0 = params["prop"]
    batch = synthetic_batch(nn, ee, 8, annotation_dim=8, seed=0,
                            node_mult=128)
    lay = sp.build_typed_dst_layout(
        batch.edge_src, batch.edge_dst, batch.edge_type, batch.edge_mask,
        batch.spec.n_pad, n_message_types=16, with_grad=True)
    ann = jnp.asarray(batch.annotations)
    es, ed, et, em = (jnp.asarray(batch.edge_src),
                      jnp.asarray(batch.edge_dst),
                      jnp.asarray(batch.edge_type),
                      jnp.asarray(batch.edge_mask))
    N = batch.spec.n_pad

    def cfg_T(T):
        return ModelConfig(state_dim=D, annotation_dim=8, n_edge_types=8,
                           n_steps=T, compute_dtype="bfloat16",
                           backend="onehot", fuse_gru=True)

    def one_step(p, lay_, h):
        # n_steps=1 propagate == one fused-typed step (scan of length 1)
        return propagate(p, cfg_T(1), ann, es, ed, et, em,
                         scatter_layout=lay_, h0=h)

    def mk(nsteps, scan):
        @functools.partial(jax.jit, static_argnames=("k",))
        def run(prop, arrs_, h, k):
            lay_ = sp.DeviceScatterLayout(meta=lay.meta, arrays=arrs_)

            def loss(p, hh):
                if scan:
                    hn = propagate(p, cfg_T(nsteps), ann, es, ed, et, em,
                                   scatter_layout=lay_, h0=hh)
                else:
                    hn = hh
                    for _ in range(nsteps):
                        hn = one_step(p, lay_, hn)
                return jnp.sum(hn * hn)

            def body(i, carry):
                prop_, acc = carry
                l, g = jax.value_and_grad(loss)(prop_, h)
                prop_ = jax.tree.map(lambda a, b: a + 1e-30 * b, prop_, g)
                return (prop_, acc + l)
            (prop, acc) = jax.lax.fori_loop(0, k, body,
                                            (prop, jnp.float32(0)))
            return acc
        return run

    h0 = jax.random.normal(jax.random.PRNGKey(1), (N, D), jnp.float32)
    # h materialized through one untimed fwd step (layout-realistic)
    h1 = jax.jit(lambda p, a_, h: one_step(
        p, sp.DeviceScatterLayout(meta=lay.meta, arrays=a_), h))(
            prop0, lay.arrays, h0)
    h1 = jax.block_until_ready(h1)

    print(f"device: {jax.devices()[0]}  N={N}", flush=True)
    only = os.environ.get("PROBE_ONLY")
    only = set(only.split(",")) if only else None
    r = {}

    def run_case(tag, nsteps, scan, h):
        if only is not None and tag not in only:
            return
        f = mk(nsteps, scan)
        r[tag] = diff(tag,
                      lambda: float(f(prop0, lay.arrays, h, k=1)),
                      lambda: float(f(prop0, lay.arrays, h, k=K)))

    run_case("vg1", 1, True, h0)
    run_case("vg1_batchedh", 1, True, h1)
    run_case("vg2_inline", 2, False, h0)
    run_case("vg2_scan", 2, True, h0)

    print("\n=== scan-tax attribution (ms) ===", flush=True)
    for t_, v in r.items():
        print(f"  {t_:13s} {v * 1e3:8.2f}", flush=True)
    if {"vg1", "vg2_inline", "vg2_scan"} <= set(r):
        print(f"  inline 2-step vs 2x single: "
              f"{(r['vg2_inline'] - 2 * r['vg1']) * 1e3:+.2f} "
              f"(composition tax)", flush=True)
        print(f"  scan 2-step vs inline 2-step: "
              f"{(r['vg2_scan'] - r['vg2_inline']) * 1e3:+.2f} "
              f"(scan machinery tax)", flush=True)


if __name__ == "__main__":
    main()
