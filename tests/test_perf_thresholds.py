"""Performance regression thresholds (SURVEY.md §4.5) — run only on real
TPU hardware (the CI suite forces CPU, where these are skipped).

One threshold per (backend, graph regime, mode), set at ~80% of the
round-4 measured numbers (BASELINE.md "Measured (round 4)" + the driver's
BENCH_r01.json): a regression below any of them means a kernel, layout,
or backward-pass change broke that hot path.  Each case is one bench.py
subprocess (remote compiles dominate — keep iters low)."""

import json
import subprocess
import sys

import pytest

import jax

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="real TPU required")

# (name, extra bench.py args, threshold edges/s) — thresholds ≈ 80% of
# the round-2 driver-round measurements: uniform fwd 252.8M / uniform
# train 104.9M / community fwd 870.7M (fuse_gru + on_demand) / community
# train 269.4M (fused trainable step + on_demand) / scale-free fwd
# 209.0M (on_demand).
#
# The two `quick`-marked cases (uniform fwd + community train — the two
# headline regimes) are the routine variant: run them alone with
# ``pytest tests/test_perf_thresholds.py -m quick`` to fit one tunnel
# session (~4 remote compiles); the unmarked rest completes the full
# regression net.
CASES = [
    # round-8 block kernel: 375.6M fwd / 127.1M train measured
    # 2026-08-21 (per-block static-type-loop typed scatter + octet grad)
    pytest.param(
        "uniform_fwd_onehot",
        ["--backend", "onehot"], 338e6, marks=pytest.mark.quick),
    ("uniform_train_onehot",
     ["--backend", "onehot", "--mode", "train"], 114e6),
    ("community_fwd_window",
     ["--backend", "window", "--communities", "512", "--block_rows", "512",
      "--fuse_gru", "--on_demand"], 696e6),
    pytest.param(
        "community_train_window",
        ["--backend", "window", "--communities", "512", "--block_rows",
         "512", "--mode", "train", "--on_demand", "--fuse_gru"], 220e6,
        marks=pytest.mark.quick),
    ("scalefree_fwd_window",
     ["--backend", "window", "--powerlaw", "1.2", "--on_demand"], 167e6),
    # scale-free through the typed ONEHOT path (block auto declines on
    # the hub -> chunked per-tile): 217.1M measured 2026-08-21 — a new
    # scale-free record, above the window backend's 209.0M; the typed
    # pack was never benchmarked on this graph class before round 8
    ("scalefree_fwd_onehot",
     ["--backend", "onehot", "--powerlaw", "1.2"], 195e6),
    # q8 serving v2 (values-only int8 table + int8-MXU window dots + XW
    # spill): 893.0M measured 2026-08-20 vs 872.7M bf16-table A/B
    ("community_fwd_window_q8",
     ["--backend", "window", "--communities", "512", "--block_rows", "512",
      "--fuse_gru", "--q8", "--xw_spill"], 714e6),
    # 1M nodes / 20M directed edges single-chip TRAIN (round-2: 266.1M
    # through the fused step; fits HBM via on-demand windows + dstl
    # streams + remat).  chain 1: chain>=2 compiles at this scale crash
    # the remote compile helper.
    ("1m_train_window",
     ["--nodes", "1000000", "--edges", "10000000", "--types", "8",
      "--communities", "4096", "--backend", "window", "--block_rows", "256",
      "--window", "512", "--mode", "train", "--on_demand", "--remat",
      "--fuse_gru", "--chain", "1"], 212e6),
    # 1M-node / 20M-edge community SERVING, the certified exact config
    # (bf16 + prebuilt table + fused step + legacy table-gather spill,
    # block_rows 256): 432.0M measured 2026-08-20 (BASELINE.md round-6
    # matrix — the r3 495.0M is superseded).  chain 2: chain 5 fwd at 1M
    # compiles, but 2 keeps the window inside one tunnel session.
    ("1m_community_fwd_window",
     ["--nodes", "1000000", "--edges", "10000000", "--types", "8",
      "--communities", "4096", "--backend", "window", "--block_rows", "256",
      "--window", "512", "--fuse_gru", "--chain", "2"], 345e6),
    # 1M-node UNIFORM training (block+octet kernels since round 8).
    # BIMODAL across sessions (DESIGN.md "Round 8: the 1M uniform
    # bimodality"): 108.7M fast-mode / 68.9-77.7M slow-mode measured
    # same-day 2026-08-21 on IDENTICAL code+config (span verifiably off;
    # the window 1M path is stable at 433.9M) — suspected HBM-placement
    # state affecting the R~21M random gather.  Floor pinned UNDER the
    # slow mode so the case catches code regressions in either mode;
    # the fast-mode capability is recorded in the ledger.
    ("1m_uniform_train_onehot",
     ["--nodes", "1000000", "--edges", "10000000", "--backend", "onehot",
      "--mode", "train", "--remat", "--chain", "1"], 66e6),
]


@requires_tpu
@pytest.mark.parametrize(
    "name,extra,threshold", CASES,
    ids=[c.values[0] if hasattr(c, "values") else c[0] for c in CASES])
def test_throughput_threshold(name, extra, threshold):
    # 5400 s: the 1m_train_window case measured ~3300 s end-to-end on
    # 2026-08-21 (remote compile variance dominates) — 3600 was a
    # near-miss.  Full-suite green run: docs/probes/perf_thresholds_r6_full.log
    # (8 passed in 2:19:48, TPU v5e via tunnel).
    out = subprocess.run(
        [sys.executable, "bench.py", "--dtype", "bfloat16",
         "--iters", "3", "--warmup", "1"] + extra,
        capture_output=True, text=True, timeout=5400)
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["value"] > threshold, (name, rec)
