"""Performance regression thresholds (SURVEY.md §4.5) — run only on real
TPU hardware (the CI suite forces CPU, where these are skipped).

Thresholds are set at ~70% of the round-1 measured numbers
(BASELINE.md): a regression below them means a kernel or layout change
broke the hot path."""

import json
import subprocess
import sys

import pytest

import jax

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="real TPU required")


@requires_tpu
def test_propagation_throughput_threshold():
    out = subprocess.run(
        [sys.executable, "bench.py", "--backend", "onehot",
         "--dtype", "bfloat16", "--iters", "3", "--warmup", "1"],
        capture_output=True, text=True, timeout=3000)
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    # round-1 measured 72.5M edges/s on v5e
    assert rec["value"] > 50e6, rec
