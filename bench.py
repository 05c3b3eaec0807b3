#!/usr/bin/env python
"""Headline benchmark: edges/sec/chip during GGNN propagation
(BASELINE.json:2) on a synthetic large random graph (BASELINE.json:11).

Prints ONE JSON line:
  {"metric": "edges_per_sec_per_chip", "value": N, "unit": "edges/s",
   "vs_baseline": R, ...}

The reference never published throughput numbers (BASELINE.json:13
``published: {}``; the mount was empty — SURVEY.md §0), so ``vs_baseline``
is reported against the framework's own portable pure-XLA fallback path
measured in the same run on the same chip: R = best_backend / xla_fallback.
R > 1 means the TPU-native kernel path beats the naive lowering.

Measurement: through the tunnel a single scalar fetch costs a fixed
~28 ms roundtrip (block_until_ready does not synchronize), so each timing
chains C iterations of the workload inside ONE jit (lax.scan with the
state fed back) and differences C=chain vs C=1 — the reported number is
the steady-state per-iteration rate, with the roundtrip subtracted out.

Usage: python bench.py [--nodes N] [--edges M] [--dim D] [--steps T]
                       [--iters K] [--types E] [--backend auto|xla|pallas]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time


def build_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=262_144)
    ap.add_argument("--edges", type=int, default=4_000_000)  # logical
    ap.add_argument("--types", type=int, default=8)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--budget", type=float, default=1800.0,
                    help="wall-clock budget (s) for the whole run; backends "
                         "not yet started when it expires are skipped and a "
                         "partial (still valid) JSON record is the output. "
                         "Every completed backend also re-emits the "
                         "cumulative JSON line immediately, so an external "
                         "timeout still leaves a parsable record")
    ap.add_argument("--chain", type=int, default=5,
                    help="iterations chained inside one jit; per-iteration "
                         "time is differenced against a chain of 1 so the "
                         "fixed per-call fetch roundtrip cancels")
    ap.add_argument("--backend", type=str, default="auto",
                    choices=["auto", "xla", "pallas", "onehot", "window"],
                    help="auto = onehot (headline) + xla (fallback "
                         "baseline) + the window_community detail. The "
                         "type-tiled 'pallas' backend is strictly dominated "
                         "by onehot (47M vs 256M on the default config) and "
                         "is excluded from auto since round 3 — each remote "
                         "compile is minutes; run it explicitly when needed")
    ap.add_argument("--communities", type=int, default=0,
                    help="community-structured graph (0 = uniform); the "
                         "'window' backend is the clustered-graph fast path")
    ap.add_argument("--p_intra", type=float, default=0.95,
                    help="intra-community edge probability")
    ap.add_argument("--powerlaw", type=float, default=0.0,
                    help="Zipf exponent for scale-free endpoints (0 = off);"
                         " nodes numbered by degree rank")
    ap.add_argument("--window", type=int, default=512,
                    help="table-row window for backend=window")
    ap.add_argument("--block_rows", type=int, default=128,
                    help="dst rows per window tile (multiples of 128 "
                         "amortize table re-reads across a community)")
    ap.add_argument("--pack", action="store_true",
                    help="int4-packed count streams for backend=window "
                         "(halves the dominant DMA stream; needs "
                         "window>=256)")
    ap.add_argument("--fuse_gru", action="store_true",
                    help="backend=window: GRU in the kernel epilogue "
                         "(fwd AND train via the emit_res custom VJP); "
                         "the onehot typed path fuses by default")
    ap.add_argument("--no_fuse", action="store_true",
                    help="disable GRU fusion everywhere (A/B control)")
    ap.add_argument("--q8", action="store_true",
                    help="with --fuse_gru: int8-quantized node-transform "
                         "table (power-of-2 per-window scales, int8 MXU)")
    ap.add_argument("--q8_grads", action="store_true",
                    help="mode=train, backend=window: int8 GRADIENT "
                         "streams — the fused backward's a-bar cotangent "
                         "quantized per block (power-of-2 scales, "
                         "int8-MXU transposed kernel)")
    ap.add_argument("--agg", type=str, default="node_transform",
                    choices=["node_transform", "edge_gather"])
    ap.add_argument("--dtype", type=str, default="bfloat16",
                    choices=["float32", "bfloat16"],
                    help="aggregation compute dtype (f32 accumulation either "
                         "way; bf16 is the production setting)")
    ap.add_argument("--mode", type=str, default="fwd",
                    choices=["fwd", "train"],
                    help="fwd: propagation only; train: full fwd+bwd+Adam")
    ap.add_argument("--remat", action="store_true",
                    help="mode=train: jax.checkpoint each propagation step "
                         "(recompute aggregation in the backward instead of "
                         "storing per-step activations — HBM-bound configs, "
                         "e.g. 1M nodes)")
    ap.add_argument("--lean", action="store_true",
                    help="backend=onehot train: lean residuals — save "
                         "(h, a) per step, recompute gates in the "
                         "backward (targets the scan-context liveness "
                         "tax, DESIGN.md round 8)")
    ap.add_argument("--no_block", action="store_true",
                    help="backend=onehot: disable the round-8 per-block "
                         "kernel + octet grad layout (A/B control)")
    ap.add_argument("--legacy_pack", action="store_true",
                    help="backend=onehot: the table-gather layout instead "
                         "of the round-4 typed pack")
    ap.add_argument("--legacy_spill", action="store_true",
                    help="deprecated no-op: table mode defaults to the "
                         "table-gather spill (see --xw_spill)")
    ap.add_argument("--xw_spill", action="store_true",
                    help="backend=window with a table: use the XW spill "
                         "anyway (gather h directly, type-major transform "
                         "buckets; always on for --on_demand)")
    ap.add_argument("--on_demand", action="store_true",
                    help="backend=window: build table windows in VMEM from "
                         "streamed h blocks (no [T2*N, D] table in HBM)")
    ap.add_argument("--chunks", type=int, default=1,
                    help="split onehot scatter into N dst-range chunks "
                         "(memory-bound configs, e.g. 1M nodes)")
    ap.add_argument("--profile", type=str, default=None,
                    help="dump a profiler trace to this directory")
    return ap.parse_args()


def main() -> int:
    args = build_args()
    import jax
    import jax.numpy as jnp

    from ggnn_tpu.data.synthetic import synthetic_batch
    from ggnn_tpu.models import ModelConfig, init_params
    from ggnn_tpu.models.ggnn import propagate

    batch = synthetic_batch(args.nodes, args.edges, args.types,
                            annotation_dim=8, seed=0,
                            # the window layout needs n_pad % block_rows
                            # == 0 (1M nodes at block_rows=256 is not
                            # 128-mult-aligned to 256)
                            node_mult=max(128, args.block_rows),
                            n_communities=args.communities,
                            p_intra=args.p_intra,
                            powerlaw_alpha=args.powerlaw)
    n_dir_edges = int(batch.edge_mask.sum())

    def bench_backend(backend: str, batch=batch,
                      block_rows: int | None = None,
                      pack: bool | None = None,
                      fuse_gru: bool | None = None,
                      on_demand: bool | None = None,
                      q8: bool | None = None,
                      q8g: bool | None = None,
                      xw: bool | None = None,
                      mode: str | None = None,
                      remat: bool | None = None,
                      chain: int | None = None) -> float:
        n_dir_edges = int(batch.edge_mask.sum())
        if fuse_gru is None:
            fuse_gru = args.fuse_gru
        if on_demand is None:
            on_demand = args.on_demand
        if q8 is None:
            q8 = args.q8
        if q8g is None:
            q8g = args.q8_grads
        if xw is None:
            xw = args.xw_spill
        if mode is None:
            mode = args.mode
        if remat is None:
            remat = args.remat
        if chain is None:
            chain = args.chain
        cfg = ModelConfig(state_dim=args.dim, annotation_dim=8,
                          n_edge_types=args.types, n_steps=args.steps,
                          backend=backend, agg_strategy=args.agg,
                          compute_dtype=args.dtype,
                          remat=(remat and mode == "train"),
                          # the fused window+GRU step is trainable since
                          # round 2 (emit_res custom VJP); the onehot
                          # backend's typed path fuses by DEFAULT (its
                          # training VJP recomputes unfused — zero cost)
                          fuse_gru=((fuse_gru or backend == "onehot")
                                    and not args.no_fuse
                                    and backend in ("window", "onehot")),
                          quantized_table=(q8 and fuse_gru
                                           and backend == "window"
                                           and mode == "fwd"),
                          lean_residuals=(args.lean
                                          and backend == "onehot"))
        if q8 and not cfg.quantized_table:
            # ADVICE r3: never let a --q8 run silently record a plain
            # bf16 number — q8 is serving-only (fwd + fuse_gru + window)
            print(f"# WARNING: q8 requested but NOT engaged for backend="
                  f"{backend} mode={mode} fuse_gru={fuse_gru} — "
                  f"recording a bf16 number", file=sys.stderr)
        params = init_params(jax.random.PRNGKey(0), cfg)
        layout = None
        if backend == "window":
            from ggnn_tpu.ops.window_pallas import (build_window_layout,
                                                    prefer_xw_spill)
            do_pack = args.pack if pack is None else pack
            # auto spill-regime switch (VERDICT r3 #2): --xw_spill still
            # forces XW; otherwise the measured heuristic picks — XW for
            # on-demand (required) and for q8 under the gather cliff,
            # legacy table-gather everywhere else
            auto_xw = prefer_xw_spill(
                batch.spec.n_pad, args.dim,
                quantized=cfg.quantized_table, on_demand=on_demand)
            layout = build_window_layout(
                batch.edge_src, batch.edge_dst, batch.edge_type,
                batch.edge_mask, batch.spec.n_pad, window=args.window,
                n_message_types=2 * args.types,
                block_rows=block_rows or args.block_rows,
                with_grad=(mode == "train"),
                pack_counts=do_pack,
                # XW (no-table) spill: required by on_demand; opt-in with
                # a table via --xw_spill (the round-4 per-(block,type)
                # typed spill fragmented — measured 407.9M vs 755.7M on
                # the community headline — so table mode defaults to the
                # legacy table-gather spill)
                # q8 composes with the XW spill since round 6 (the spill
                # gathers h directly — no table dequant, no quant noise)
                # q8 composes with EITHER spill (the legacy spill
                # dequantizes via the scales vector) — at 1M the legacy
                # spill is 27% faster (432.0 vs 339.0M, 2026-08-20), so
                # q8 no longer forces the XW spill; pass --xw_spill
                typed_spill=((xw or auto_xw)
                             and not do_pack
                             and batch.spec.n_pad % 128 == 0),
                on_demand=on_demand,
                grad_quant=(q8g and mode == "train"),
                row_major=("block" if batch.spec.n_pad % 128 == 0
                           else "src"))
            print(f"# window layout: {layout.stats}", file=sys.stderr)
        elif backend == "onehot":
            from ggnn_tpu.ops.scatter_pallas import (
                build_chunked_dst_layouts, build_dst_block_layout,
                build_typed_dst_layout)
            # device layout passes through jit ARGUMENTS — a closure
            # constant would bake the one-hot stream into the compile
            # payload (HTTP 413 on remote compile)
            if args.chunks > 1:
                layout = build_chunked_dst_layouts(
                    batch.edge_src, batch.edge_dst, batch.edge_type,
                    batch.edge_mask, batch.spec.n_pad,
                    n_chunks=args.chunks, tile_e=2048)
            elif args.legacy_pack or batch.spec.n_pad % 128:
                layout = build_dst_block_layout(
                    batch.edge_src, batch.edge_dst, batch.edge_type,
                    batch.edge_mask, batch.spec.n_pad, tile_e=2048,
                    with_grad=(mode == "train"),
                    n_message_types=2 * args.types,
                    # 16-aligned packing: the per-row gather engine reads
                    # ~real rows instead of tile_e-padded (grad layouts
                    # pack aligned too since round 4)
                    edge_align=16,
                    # block-major table rows: the Pallas table kernel
                    # replaces the relayout-taxed XLA einsum
                    row_order=("block" if batch.spec.n_pad % 128 == 0
                               else "type")).to_device()
            else:
                # typed pack (round 4, default): gather h DIRECTLY — the
                # row engine is ~3.5× faster on the [N, D] footprint than
                # on the [2E·N, D] table — and apply W_t inside the
                # scatter kernel on single-type tiles
                layout = build_typed_dst_layout(
                    batch.edge_src, batch.edge_dst, batch.edge_type,
                    batch.edge_mask, batch.spec.n_pad,
                    n_message_types=2 * args.types,
                    with_grad=(mode == "train"),
                    block_mode=False if args.no_block else "auto")

        ops = (jnp.asarray(batch.annotations), jnp.asarray(batch.edge_src),
               jnp.asarray(batch.edge_dst), jnp.asarray(batch.edge_type),
               jnp.asarray(batch.edge_mask), jnp.asarray(batch.type_offsets),
               layout)

        if mode == "fwd":
            from ggnn_tpu.models.ggnn import init_state

            @functools.partial(jax.jit, static_argnames=("chain",))
            def run(prop, ann, es, ed, et, em, to, lay, chain):
                tiles = None
                if cfg.backend == "pallas":  # topology-static: hoist
                    from ggnn_tpu.ops.spmm_pallas import pack_type_tiles
                    tiles = pack_type_tiles(es, ed, et, em, to,
                                            cfg.n_message_types)

                def body(h, _):
                    h = propagate(prop, cfg, ann, es, ed, et, em,
                                  type_offsets=to, scatter_layout=lay, h0=h,
                                  tiles_layout=tiles)
                    return h, None
                h0 = init_state(ann, cfg.state_dim)
                h, _ = jax.lax.scan(body, h0, None, length=chain)
                # scalar reduce: fetching it forces full execution even on
                # remote backends where block_until_ready is lazy
                return jnp.sum(h)

            def step(chain):
                return float(run(params["prop"], *ops, chain=chain))
        else:
            import optax
            optimizer = optax.adam(1e-3)
            opt_state0 = optimizer.init(params["prop"])

            @functools.partial(jax.jit, static_argnames=("chain",))
            def train(prop, opt_state, ann, es, ed, et, em, to, lay, chain):
                def body(carry, _):
                    prop, opt_state = carry

                    def loss_fn(p):
                        h = propagate(p, cfg, ann, es, ed, et, em,
                                      type_offsets=to, scatter_layout=lay)
                        return jnp.sum(h * h)
                    loss, grads = jax.value_and_grad(loss_fn)(prop)
                    updates, opt_state = optimizer.update(grads, opt_state,
                                                          prop)
                    prop = optax.apply_updates(prop, updates)
                    return (prop, opt_state), loss
                (prop, opt_state), losses = jax.lax.scan(
                    body, (prop, opt_state), None, length=chain)
                return losses[-1]

            def step(chain):
                return float(train(params["prop"], opt_state0, *ops,
                                   chain=chain))

        def timed(chain):
            step(chain)  # compile
            for _ in range(args.warmup):
                step(chain)
            best = float("inf")
            for _ in range(args.iters):
                t0 = time.perf_counter()
                step(chain)
                best = min(best, time.perf_counter() - t0)
            return best

        from ggnn_tpu.profiling import trace
        with trace(args.profile):
            t1 = timed(1)
            tc = timed(chain) if chain > 1 else t1
        # steady-state per-iteration time: the fixed per-call fetch
        # roundtrip cancels in the difference
        per = (tc - t1) / (chain - 1) if chain > 1 else t1
        if per <= 0:  # timing noise floor — fall back to the amortized rate
            per = tc / chain
        return n_dir_edges * args.steps / per

    if args.legacy_spill:
        print("# --legacy_spill is deprecated and a no-op (table mode "
              "already defaults to the table-gather spill; see --xw_spill)",
              file=sys.stderr)
    if args.backend in ("auto", "onehot") and not args.no_fuse:
        print("# note: backend=onehot fuses the GRU by default since "
              "round 2 (pass --no_fuse for the pre-fusion A/B baseline)",
              file=sys.stderr)

    t_start = time.perf_counter()
    # Perf provenance (VERDICT r3 #7): every record carries the git rev +
    # a timestamp, and the final record of each run is appended to the
    # committed docs/perf_ledger.jsonl — so a number can always be
    # attributed to the exact code state that produced it.
    import datetime
    import pathlib
    import subprocess
    repo_dir = pathlib.Path(__file__).resolve().parent
    try:
        git_rev = subprocess.run(
            ["git", "-C", str(repo_dir), "rev-parse", "--short=12", "HEAD"],
            capture_output=True, text=True, timeout=10).stdout.strip() \
            or "unknown"
        dirty = bool(subprocess.run(
            ["git", "-C", str(repo_dir), "status", "--porcelain",
             "--untracked-files=no"],
            capture_output=True, text=True, timeout=10).stdout.strip())
    except Exception:
        git_rev, dirty = "unknown", False
    # Driver-certified round-1 xla fallback on the DEFAULT config
    # (BENCH_r01.json) — used for vs_baseline only until/unless xla is
    # measured in this run, so an early external timeout still yields a
    # meaningful ratio for the headline backend.
    R01_XLA = 34850338.5
    default_cfg = (args.nodes == 262_144 and args.edges == 4_000_000
                   and args.types == 8 and args.dim == 128
                   and args.steps == 5 and args.mode == "fwd"
                   and not args.communities and not args.powerlaw)
    results = {}
    skipped = []

    def emit():
        """Cumulative JSON record; re-emitted after every backend so an
        external timeout always leaves the tail parsable."""
        uniform = {k: v for k, v in results.items()
                   if not k.startswith("window_community")}
        best_name = max(uniform, key=uniform.get) if uniform \
            else max(results, key=results.get)
        best = results[best_name]
        if "xla" in results:
            baseline, bsrc = results["xla"], "measured"
        elif default_cfg:
            baseline, bsrc = R01_XLA, "r01_certified"
        else:
            baseline, bsrc = best, "self"
        rec = {
            "metric": "edges_per_sec_per_chip",
            "value": round(best, 1),
            "unit": "edges/s",
            "vs_baseline": round(best / baseline, 4),
            "backend": best_name,
            "baseline_source": bsrc,
            "detail": {k: round(v, 1) for k, v in results.items()},
            "config": {"nodes": args.nodes, "logical_edges": args.edges,
                       "directed_edges": n_dir_edges, "types": args.types,
                       "dim": args.dim, "steps": args.steps,
                       "device": str(jax.devices()[0])},
            "elapsed_s": round(time.perf_counter() - t_start, 1),
            "git_rev": git_rev + ("-dirty" if dirty else ""),
            "timestamp": datetime.datetime.now(
                datetime.timezone.utc).isoformat(timespec="seconds"),
            "mode": args.mode,
        }
        if skipped:
            rec["skipped"] = list(skipped)
        print(json.dumps(rec), flush=True)
        return rec

    # Measurement plan, headline FIRST (onehot is the uniform-graph value;
    # xla supplies vs_baseline; window_community is the clustered-graph
    # detail) so a budget/timeout cut loses the least important entries.
    plan = []
    if args.backend == "auto":
        plan.append(("onehot", lambda: bench_backend("onehot")))
        plan.append(("xla", lambda: bench_backend("xla")))
        if default_cfg:
            # uniform TRAIN record (round 8): full fwd+bwd+Adam through
            # the block fwd scatter + octet grad kernels — so the
            # driver's artifact carries the adversarial-graph training
            # number too (127.1M measured 2026-08-21)
            plan.append(("onehot_train",
                         lambda: bench_backend("onehot", mode="train")))
        if default_cfg:
            comm_cache = []

            def _comm_batch():
                if not comm_cache:
                    comm_cache.append(synthetic_batch(
                        args.nodes, args.edges, args.types,
                        annotation_dim=8, seed=0, node_mult=128,
                        n_communities=max(args.nodes // 512, 1),
                        p_intra=0.95))
                return comm_cache[0]

            def _community():
                # secondary showcase (does NOT enter value/vs_baseline):
                # windowed block-CSR on a community graph — the
                # partitioned-production regime where the per-edge gather
                # engine rate no longer binds. On-demand table windows +
                # XW spill: the round-2 headline config (870.7M measured
                # vs 788.7M table+legacy spill).
                # q8=False pinned: this entry is the bit-exact bf16
                # control even when the CLI passes --q8 (on_demand and
                # quantized_table are mutually exclusive anyway)
                return bench_backend("window", batch=_comm_batch(),
                                     block_rows=512, fuse_gru=True,
                                     on_demand=True, q8=False)

            def _community_q8():
                # only reachable with args.mode == "fwd" (default_cfg
                # requires it) — q8 is serving-only, so the label can
                # never cover a bf16 train number (ADVICE r3)
                assert args.mode == "fwd"
                # int8 serving mode (values-only int8 table + int8-MXU
                # window dots + XW spill): 893.0M vs the 872.7M bf16-table
                # control at this config (2026-08-20 A/B) — the measured
                # 496-vs-612 ns/tile int8 window lead, cashed.  Quantized
                # numerics (serving only) — kept as a separate detail so
                # window_community stays the bit-exact bf16 number.
                return bench_backend("window", batch=_comm_batch(),
                                     block_rows=512, fuse_gru=True,
                                     on_demand=False, q8=True, xw=True)

            def _community_train():
                # TRAINING record (VERDICT r3 #6): full fwd+bwd+Adam
                # through the fused trainable window step (emit_res
                # custom VJP) — same config as the perf-threshold case
                # community_train_window (see its floor in
                # tests/test_perf_thresholds.py).  Placed before
                # q8 so a budget cut loses the already-r03-certified q8
                # entry rather than the first-ever driver train number.
                return bench_backend("window", batch=_comm_batch(),
                                     block_rows=512, fuse_gru=True,
                                     on_demand=True, q8=False,
                                     mode="train")

            def _community_1m():
                # BASELINE-scale record (VERDICT r4 #5): the certified
                # 1M-node / 20M-directed-edge serving config (bf16 +
                # prebuilt table + fused step + legacy table-gather
                # spill, block_rows 256 — 432.0M measured 2026-08-20;
                # matches the 1m_community_fwd_window threshold case).
                # chain 2: chain>=5 at this scale risks the remote
                # compile helper.  Placed LAST so a budget cut loses it
                # before any smaller-scale certified entry.
                b1m = synthetic_batch(1_000_000, 10_000_000, args.types,
                                      annotation_dim=8, seed=0,
                                      node_mult=256, n_communities=4096,
                                      p_intra=0.95)
                return bench_backend("window", batch=b1m, block_rows=256,
                                     fuse_gru=True, on_demand=False,
                                     q8=False, xw=False, chain=2)

            def _community_train_q8g():
                # int8 GRADIENT streams (round 8): a-bar cotangent
                # quantized per block, int8-MXU transposed backward.
                # 299.4M vs the 277.8M exact control (2026-08-21 A/B);
                # accuracy-gated by test_q8_accuracy.py (training gate).
                # Kept separate so window_community_train stays the
                # exact-bf16 number.
                return bench_backend("window", batch=_comm_batch(),
                                     block_rows=512, fuse_gru=True,
                                     on_demand=True, q8=False,
                                     mode="train", q8g=True)

            plan.append(("window_community", _community))
            plan.append(("window_community_train", _community_train))
            plan.append(("window_community_q8", _community_q8))
            plan.append(("window_community_train_q8g",
                         _community_train_q8g))
            plan.append(("window_community_1m", _community_1m))
    else:
        plan.append((args.backend, lambda: bench_backend(args.backend)))

    final_rec = None
    for name, fn in plan:
        elapsed = time.perf_counter() - t_start
        if results and elapsed > args.budget:
            skipped.append(name)
            print(f"# {name} skipped: {elapsed:.0f}s elapsed > "
                  f"--budget {args.budget:.0f}s", file=sys.stderr)
            continue
        try:
            results[name] = fn()
            print(f"# {name}: {results[name]:.3e} edges/s", file=sys.stderr)
        except Exception as e:  # keep the bench alive if one path breaks
            print(f"# {name} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
        if results:
            final_rec = emit()

    # append-only provenance ledger (VERDICT r3 #7) — real-chip runs only
    # (CPU test subprocesses would otherwise pollute it)
    if final_rec is not None and jax.devices()[0].platform == "tpu":
        try:
            ledger = repo_dir / "docs" / "perf_ledger.jsonl"
            ledger.parent.mkdir(exist_ok=True)
            with open(ledger, "a") as f:
                f.write(json.dumps(final_rec) + "\n")
        except OSError as e:
            print(f"# ledger append failed: {e}", file=sys.stderr)

    if not results:
        print(json.dumps({"metric": "edges_per_sec_per_chip", "value": 0.0,
                          "unit": "edges/s", "vs_baseline": 0.0,
                          "error": "all backends failed"}), flush=True)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
