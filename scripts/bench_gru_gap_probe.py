#!/usr/bin/env python
"""Decompose the Pallas GRU cell's 3.6 ms (fwd, 262K x 128) vs the
~0.5 ms pure-DMA floor (VERDICT r2 #5).

Method: a ladder of kernel variants, each adding ONE phase of the cell
(DMA -> +a read -> +W_a dot -> +U_zr dot -> +sigmoids -> +U_h dot ->
full cell with tanh+blend).  Each variant is timed by chaining K
iterations inside one jit (out feeds back as h) and differencing vs
chain=1 — the fixed tunnel-fetch roundtrip cancels (CLAUDE.md).  The
per-phase deltas name where the time goes: HBM traffic scales with the
refs touched, MXU with the dots, VPU with the transcendental count.

Also measures: block=256/128 (weight-reload amortization), bf16 h/a
inputs (halved read bytes), and f32 matmul inputs (VPU convert cost).

Usage: python -u scripts/bench_gru_gap_probe.py [--nodes 262144]
       [--dim 128] [--chain 8] [--iters 3] > /tmp/gru_gap.log 2>&1
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=262144)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--block", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    N, D = args.nodes, args.dim
    interpret = jax.default_backend() != "tpu"
    print(f"# backend={jax.default_backend()} N={N} D={D} "
          f"block={args.block} chain={args.chain}", flush=True)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    h0 = jax.random.normal(ks[0], (N, D), jnp.float32)
    a = jax.random.normal(ks[1], (N, D), jnp.float32) * 0.1
    wa = jax.random.normal(ks[2], (D, 3 * D), jnp.float32) * 0.05
    ball = jax.random.normal(ks[3], (1, 3 * D), jnp.float32) * 0.05
    uzr = jax.random.normal(ks[4], (D, 2 * D), jnp.float32) * 0.05
    uh = jax.random.normal(ks[5], (D, D), jnp.float32) * 0.05

    def make_variant(phase: int, mdt, in_dt, block):
        """phase: 0 copy, 1 +a, 2 +mm1, 3 +mm2, 4 +sigmoids, 5 +mm3,
        6 full cell."""
        def kernel(h_ref, a_ref, wa_ref, ball_ref, uzr_ref, uh_ref,
                   out_ref):
            h = h_ref[...].astype(jnp.float32)
            if phase == 0:
                out_ref[...] = (h * 0.999).astype(out_ref.dtype)
                return
            av = a_ref[...].astype(jnp.float32)
            if phase == 1:
                out_ref[...] = (h * 0.999 + 1e-6 * av).astype(out_ref.dtype)
                return

            def mm(x, w):
                return jnp.dot(x.astype(mdt), w[...].astype(mdt),
                               preferred_element_type=jnp.float32)

            pa = mm(av, wa_ref) + ball_ref[...]
            if phase == 2:
                out_ref[...] = (h * 0.999 + 1e-6 * pa[:, :D]).astype(
                    out_ref.dtype)
                return
            ph = mm(h, uzr_ref)
            if phase == 3:
                out_ref[...] = (h * 0.999 + 1e-6 * (pa[:, :D] + ph[:, :D])
                                ).astype(out_ref.dtype)
                return
            z = jax.nn.sigmoid(pa[:, :D] + ph[:, :D])
            r = jax.nn.sigmoid(pa[:, D:2 * D] + ph[:, D:])
            if phase == 4:
                out_ref[...] = (h * 0.999 + 1e-6 * (z + r)).astype(
                    out_ref.dtype)
                return
            q = pa[:, 2 * D:] + mm(r * h, uh_ref)
            if phase == 5:
                out_ref[...] = (h * 0.999 + 1e-6 * q).astype(out_ref.dtype)
                return
            htil = jnp.tanh(q)
            out_ref[...] = ((1.0 - z) * h + z * htil).astype(out_ref.dtype)

        n_blocks = N // block
        row = lambda cols: pl.BlockSpec((block, cols), lambda i: (i, 0))
        full = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0))

        @jax.jit
        def call(h, a, wa, ball, uzr, uh):
            return pl.pallas_call(
                kernel, grid=(n_blocks,),
                in_specs=[row(D), row(D), full(D, 3 * D), full(1, 3 * D),
                          full(D, 2 * D), full(D, D)],
                out_specs=row(D),
                out_shape=jax.ShapeDtypeStruct((N, D), h.dtype),
                interpret=interpret,
            )(h.astype(in_dt), a.astype(in_dt), wa, ball, uzr, uh)
        return call

    roundtrip = [None]  # fixed per-call fetch cost, measured ONCE on V0

    def timed(call, chain, calibrate=False):
        # all big arrays flow through jit ARGUMENTS — closure constants
        # bake into the remote-compile payload (HTTP 413 / multi-minute
        # upload stalls; CLAUDE.md).  The fixed roundtrip is variant-
        # independent: V0 measures it via chain-1/chain-C differencing
        # (2 compiles); every later variant compiles only the chain-C
        # jit and subtracts it — halves the remote-compile count.
        @functools.partial(jax.jit, static_argnames=("c",))
        def run(h, a, wa, ball, uzr, uh, c):
            def body(hh, _):
                out = call(hh.astype(jnp.float32), a, wa, ball, uzr, uh)
                return out.astype(jnp.float32), None
            hh, _ = jax.lax.scan(body, h, None, length=c)
            return jnp.sum(hh)

        ops = (h0, a, wa, ball, uzr, uh)
        float(run(*ops, c=args.chain))  # compile + warm
        bestc = float("inf")
        if calibrate or roundtrip[0] is None:
            float(run(*ops, c=1))
            best1 = float("inf")
            for _ in range(args.iters):
                t0 = time.perf_counter()
                float(run(*ops, c=1))
                best1 = min(best1, time.perf_counter() - t0)
                t0 = time.perf_counter()
                float(run(*ops, c=args.chain))
                bestc = min(bestc, time.perf_counter() - t0)
            per = (bestc - best1) / (args.chain - 1)
            if per <= 0:
                per = bestc / args.chain
            roundtrip[0] = max(best1 - per, 0.0)
            print(f"# roundtrip calibrated: {roundtrip[0] * 1e3:.2f} ms",
                  flush=True)
            return per
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(run(*ops, c=args.chain))
            bestc = min(bestc, time.perf_counter() - t0)
        return max(bestc - roundtrip[0], 1e-9) / args.chain

    names = ["V0 copy h", "V1 +read a", "V2 +a@Wa", "V3 +h@Uzr",
             "V4 +sigmoids", "V5 +rh@Uh", "V6 full cell"]
    prev = 0.0
    results = {}
    for p, name in enumerate(names):
        per = timed(make_variant(p, jnp.bfloat16, jnp.float32,
                                 args.block), args.chain)
        results[name] = per
        print(f"{name:16s}: {per * 1e3:7.3f} ms  (delta "
              f"{(per - prev) * 1e3:+7.3f} ms)", flush=True)
        prev = per

    for block in (256, 128):
        if N % block == 0:
            per = timed(make_variant(6, jnp.bfloat16, jnp.float32, block),
                        args.chain)
            print(f"full @block={block:4d}: {per * 1e3:7.3f} ms", flush=True)
    per = timed(make_variant(6, jnp.bfloat16, jnp.bfloat16, args.block),
                args.chain)
    print(f"full, bf16 h/a in: {per * 1e3:7.3f} ms", flush=True)
    per = timed(make_variant(6, jnp.float32, jnp.float32, args.block),
                args.chain)
    print(f"full, f32 matmuls: {per * 1e3:7.3f} ms", flush=True)

    # reference: the production cell from ops/gru_pallas.py (emits the
    # z/r/htil residual streams too — the training forward)
    from ggnn_tpu.ops.gru_pallas import gru_cell_fwd

    @functools.partial(jax.jit, static_argnames=("c",))
    def run_prod(h, a, wa, ball, uzr, uh, c):
        def body(hh, _):
            out, z, r, ht = gru_cell_fwd(hh, a, wa, ball[0], uzr, uh,
                                         interpret=interpret)
            return out, None
        hh, _ = jax.lax.scan(body, h, None, length=c)
        return jnp.sum(hh)

    ops = (h0, a, wa, ball, uzr, uh)
    float(run_prod(*ops, c=args.chain))
    bc = float("inf")
    for _ in range(args.iters):
        t0 = time.perf_counter(); float(run_prod(*ops, c=args.chain))
        bc = min(bc, time.perf_counter() - t0)
    per = max(bc - (roundtrip[0] or 0.0), 1e-9) / args.chain
    print(f"prod gru_cell_fwd ([+3 residual writes]): {per * 1e3:7.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
