#!/bin/bash
# Round-3 TPU measurement sequence 3. ONE TPU job at a time.
#
# Context: at 1M/20M/4096comm (block_rows=256, window=512, fused):
# on-demand 292.2M / table+XW-spill 339.0M / table+XW+q8 375.0M — all
# below round-3's 495.0M whose stack was table + fused + LEGACY
# 16-aligned mono spill (no XW).  A/B the spill mode at scale.
set -x
cd /root/repo

# S1: exact round-3 stack — table + fused + legacy table-gather spill
python -u bench.py --nodes 1000000 --edges 10000000 --communities 4096 \
    --backend window --block_rows 256 --window 512 --fuse_gru \
    --chain 2 --dtype bfloat16 > /tmp/bench_r3_S1_1m_legacy_spill.log 2>&1

# S2: block_rows 512 at 1M (262K best is 512; r2's 1M best was 256 —
# re-check under the round-6 stack) with the better spill mode from S1
python -u bench.py --nodes 1000000 --edges 10000000 --communities 4096 \
    --backend window --block_rows 512 --window 512 --fuse_gru \
    --chain 2 --dtype bfloat16 > /tmp/bench_r3_S2_1m_br512.log 2>&1

echo DONE > /tmp/bench_r3_experiments3.done
