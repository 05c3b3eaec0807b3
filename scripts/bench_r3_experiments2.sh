#!/bin/bash
# Round-3 (driver round 3) TPU measurement sequence 2. ONE TPU job at a time.
#
# Context from sequence 1 (2026-08-20): q8 v2 893.0M vs bf16-table
# control 872.7M at 262K (the int8 lead cashed); 1M community
# ON-DEMAND measured 292.2M — on-demand rebuilds each table window once
# per TILE (74K builds) where the prebuilt table builds each window once
# (31K), so the redundancy grows with scale and table mode should win at
# 1M.  M1 died on SMEM (125K prefetch tiles = 1.95 MB) — fixed by the
# chunked typed path (commit 62c95fc).
set -x
cd /root/repo

# M1-redo: 1M-node / 20M-edge UNIFORM fwd through the (now chunked)
# typed pack — BASELINE.md still carries round-3's 39.9M chunked-onehot
# number
python -u bench.py --nodes 1000000 --edges 10000000 --backend onehot \
    --chain 2 --dtype bfloat16 > /tmp/bench_r3_M1b_1m_uniform.log 2>&1

# M3: 1M community fwd, PREBUILT table windows + fused step + XW spill
python -u bench.py --nodes 1000000 --edges 10000000 --communities 4096 \
    --backend window --block_rows 256 --window 512 --fuse_gru --xw_spill \
    --chain 2 --dtype bfloat16 > /tmp/bench_r3_M3_1m_table.log 2>&1

# M4: M3 + q8 (values-only int8 table: build writes and window DMA both
# halve — the table path's costs are exactly what q8 shrinks)
python -u bench.py --nodes 1000000 --edges 10000000 --communities 4096 \
    --backend window --block_rows 256 --window 512 --fuse_gru --xw_spill \
    --q8 --chain 2 --dtype bfloat16 > /tmp/bench_r3_M4_1m_q8.log 2>&1

# M5 (stretch): 1M uniform TRAIN via the chunked typed path (grad mono
# chunked too); chain 1 — chain>=2 train compiles at 1M crash the
# remote compile helper
python -u bench.py --nodes 1000000 --edges 10000000 --backend onehot \
    --mode train --remat --chain 1 --dtype bfloat16 \
    > /tmp/bench_r3_M5_1m_train.log 2>&1

echo DONE > /tmp/bench_r3_experiments2.done
