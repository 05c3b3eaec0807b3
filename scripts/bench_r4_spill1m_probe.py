#!/usr/bin/env python
"""VERDICT r3 #2: isolate WHY the XW typed spill loses 27% to the legacy
table-gather spill at 1M (339.0M vs 432.0M) when they tie at 262K.

CPU-side finding (2026-08-21): cross-bucket padding is 0.4% at 1M
(tot=1110016 vs 1105952 real spilled) — NOT the mechanism.  Remaining
suspects: the msgs materialization + second permutation gather, both in
the footprint-sensitive gather regime (h = 256 MB, msgs pack = 284 MB
at 1M vs 64/100 MB at 262K).

Components (k-chain-differenced):
  xw_full      _spill_partial (h gather + bucket einsum + perm gather +
               mono scatter)
  leg_full     legacy: table row gather + mono scatter
  xw_ge        h gather + bucket einsum only (msgs materialized)
  xw_perm      the second permutation gather alone (from a prebuilt pack)
  spill_scat   mono scatter alone (pre-permuted msgs passed in)
  leg_gather   the table row gather alone

Run ON THE TPU:
  python -u scripts/bench_r4_spill1m_probe.py [262k] > log 2>&1
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
E_SP = None  # real spilled edges


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
    print(f"{tag}: {per * 1e3:.3f} ms/iter  "
          f"({per / max(E_SP, 1) * 1e9:.2f} ns/spilled-edge)", flush=True)
    return per


def main():
    global E_SP
    small = os.environ.get("PROBE_SMALL") == "1"
    at262k = "262k" in sys.argv
    D = 128
    cfg = ModelConfig(state_dim=D, annotation_dim=8, n_edge_types=8,
                      compute_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(1), cfg)
    msg_w = params["prop"]["msg_w"].astype(jnp.bfloat16)
    msg_b = params["prop"]["msg_b"].astype(jnp.bfloat16)

    if small:
        nn, ee, nc, br = 2048, 32768, 16, 128
    elif at262k:
        nn, ee, nc, br = 262_144, 4_000_000, 512, 512
    else:
        nn, ee, nc, br = 1_000_000, 10_000_000, 4096, 256
    win = 128 if small else 512
    batch = synthetic_batch(nn, ee, 8, annotation_dim=8, seed=0,
                            node_mult=max(128, br), n_communities=nc,
                            p_intra=0.95)
    spill_arrs = {}
    metas = {}
    for key, typed, dst_order in (("xw", True, False),
                                  ("xwd", True, True),
                                  ("leg", False, False)):
        lay = wp.build_window_layout(
            batch.edge_src, batch.edge_dst, batch.edge_type,
            batch.edge_mask, batch.spec.n_pad, window=win,
            n_message_types=16, block_rows=br, with_grad=False,
            typed_spill=typed, spill_dst_order=dst_order,
            on_demand=False, row_major="block")
        # keep ONLY the spill arrays — the window streams are device-
        # resident GBs at 1M; free them IMMEDIATELY (two layouts + the
        # 4.3 GB table OOM'd 16 GB HBM otherwise)
        stats = dict(lay.stats)
        for k in list(lay.arrays.keys()):
            if not k.startswith("s"):
                lay.arrays[k].delete()
                del lay.arrays[k]
        spill_arrs[key] = {k: np.asarray(v) for k, v in lay.arrays.items()
                           if not k.startswith("sb_")}
        metas[key] = lay.spill_meta
        for v in lay.arrays.values():
            v.delete()
        del lay
        if typed:
            print(f"xw stats: {stats}", flush=True)
    sm_xw, sm_leg = metas["xw"], metas["leg"]
    sm_xwd = metas["xwd"]
    offs = sm_xw[8]
    tot = int(offs[-1])
    E_SP = int(np.sum(np.asarray(spill_arrs["xw"]["sx_src"]) <
                      batch.spec.n_pad))
    N = batch.spec.n_pad
    T2 = 16
    pack = int(spill_arrs["xw"]["s_gather_idx"].shape[0])
    print(f"N={N} spilled(real)={E_SP} tot(bucketed)={tot} pack={pack}",
          flush=True)
    print(f"footprints: h={N * D * 2 / 1e6:.0f}MB msgs={tot * D * 2 / 1e6:.0f}MB "
          f"table={T2 * N * D * 2 / 1e6:.0f}MB", flush=True)

    h = jax.random.normal(jax.random.PRNGKey(2), (N, D), jnp.float32)
    hc = jax.device_put(h.astype(jnp.bfloat16))

    # the legacy spill gathers from the node-transform table
    table = jax.jit(lambda hh: wp._node_table(hh, msg_w, msg_b, "block",
                                              INTERP))(hc)
    table = jax.block_until_ready(table)

    # a prebuilt type-major msgs pack (for the perm/scatter-only probes)
    def _msgs(hh, src):
        hsp = jnp.where((src < N)[:, None], hh[jnp.minimum(src, N - 1)], 0)
        P = tot // T2
        return (jnp.einsum("tpd,tdf->tpf", hsp.reshape(T2, P, D), msg_w,
                           preferred_element_type=jnp.float32)
                + msg_b[:, None, :].astype(jnp.float32)
                ).reshape(-1, D).astype(jnp.bfloat16)
    msgs0 = jax.jit(_msgs)(hc, jnp.asarray(spill_arrs["xw"]["sx_src"]))
    msgs0 = jax.block_until_ready(msgs0)
    perm0 = jax.jit(lambda m, i: m[i])(
        msgs0, jnp.asarray(spill_arrs["xw"]["s_gather_idx"]))
    perm0 = jax.block_until_ready(perm0)

    def chained(body):
        @functools.partial(jax.jit, static_argnames=("k",))
        def run(x, aux, k):
            def it(i, x):
                return body(x, aux)
            x = jax.lax.fori_loop(0, k, it, x)
            return jnp.sum(x)
        return run

    # ---- components ----
    xw_full = chained(lambda x, aux: x * 0 + wp._spill_partial(
        x.astype(jnp.bfloat16), None, aux, sm_xw, msg_w, msg_b,
        INTERP)[:N].astype(x.dtype))

    def _leg_full(x, aux):
        t, arrs_ = aux
        zero = (x[0, 0] * 1e-30).astype(arrs_["s_gather_idx"].dtype)
        a2 = dict(arrs_)
        a2["s_gather_idx"] = arrs_["s_gather_idx"] + zero  # hard dep
        return x * 0 + wp._spill_scatter(t, a2, sm_leg,
                                         INTERP)[:N].astype(x.dtype)
    leg_full = chained(_leg_full)

    def _ge(x, aux):
        m = _msgs(x.astype(jnp.bfloat16), aux)
        return x * 0 + m[:N].astype(x.dtype)
    xw_ge = chained(_ge)

    def _perm(x, aux):
        m, idx = aux
        zero = (x[0, 0] * 1e-30).astype(idx.dtype)
        g = m[idx + zero]     # hard dep: un-hoistable (LICM hygiene)
        return x * 0 + g[:N].astype(x.dtype)
    xw_perm = chained(_perm)

    def _scat(x, aux):
        m, arrs_ = aux
        m = m + (x[0, 0] * 1e-30).astype(m.dtype)  # hard dep (~1 pack pass)
        out = wp._spill_scatter_msgs(m, arrs_, sm_xw, INTERP)
        return x * 0 + out[:N].astype(x.dtype)
    spill_scat = chained(_scat)

    def _lgather(x, aux):
        t, idx = aux
        zero = (x[0, 0] * 1e-30).astype(idx.dtype)
        g = t[idx + zero]     # hard dep: un-hoistable
        return x * 0 + g[:N].astype(x.dtype)
    leg_gather = chained(_lgather)

    print(f"device: {jax.devices()[0]}", flush=True)
    xw_arr = {k: jnp.asarray(v) for k, v in spill_arrs["xw"].items()}
    leg_arr = {k: jnp.asarray(v) for k, v in spill_arrs["leg"].items()}
    xwd_arr = {k: jnp.asarray(v) for k, v in spill_arrs["xwd"].items()}

    xwd_full = chained(lambda x, aux: x * 0 + wp._spill_partial(
        x.astype(jnp.bfloat16), None, aux, sm_xwd, msg_w, msg_b,
        INTERP)[:N].astype(x.dtype))

    r = {}
    r["xw_full"] = diff("xw_full",
                        lambda: float(xw_full(h, xw_arr, k=1)),
                        lambda: float(xw_full(h, xw_arr, k=K)))
    r["xwd_full"] = diff("xwd_full (dst-ordered buckets)",
                         lambda: float(xwd_full(h, xwd_arr, k=1)),
                         lambda: float(xwd_full(h, xwd_arr, k=K)))
    r["leg_full"] = diff("leg_full",
                         lambda: float(leg_full(h, (table, leg_arr), k=1)),
                         lambda: float(leg_full(h, (table, leg_arr), k=K)))
    r["xw_ge"] = diff("xw_ge",
                      lambda: float(xw_ge(h, xw_arr["sx_src"], k=1)),
                      lambda: float(xw_ge(h, xw_arr["sx_src"], k=K)))
    r["xw_perm"] = diff(
        "xw_perm",
        lambda: float(xw_perm(h, (msgs0, xw_arr["s_gather_idx"]), k=1)),
        lambda: float(xw_perm(h, (msgs0, xw_arr["s_gather_idx"]), k=K)))
    r["spill_scat"] = diff(
        "spill_scat",
        lambda: float(spill_scat(h, (perm0, xw_arr), k=1)),
        lambda: float(spill_scat(h, (perm0, xw_arr), k=K)))
    r["leg_gather"] = diff(
        "leg_gather",
        lambda: float(leg_gather(h, (table, leg_arr["s_gather_idx"]), k=1)),
        lambda: float(leg_gather(h, (table, leg_arr["s_gather_idx"]), k=K)))

    print("\n=== summary (ms/iter) ===", flush=True)
    for k, v in r.items():
        print(f"  {k:12s} {v * 1e3:8.3f}", flush=True)
    print(f"  xw decomposed: ge {r['xw_ge'] * 1e3:.2f} + perm "
          f"{r['xw_perm'] * 1e3:.2f} + scat {r['spill_scat'] * 1e3:.2f} "
          f"= {(r['xw_ge'] + r['xw_perm'] + r['spill_scat']) * 1e3:.2f} "
          f"(vs full {r['xw_full'] * 1e3:.2f})", flush=True)
    print(f"  leg decomposed: gather {r['leg_gather'] * 1e3:.2f} + scat "
          f"~{r['spill_scat'] * 1e3:.2f} (vs full "
          f"{r['leg_full'] * 1e3:.2f})", flush=True)


if __name__ == "__main__":
    main()
