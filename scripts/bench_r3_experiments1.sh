#!/bin/bash
# Round-3 (driver round 3) TPU measurement sequence 1. ONE TPU job at a time.
set -x
cd /root/repo

# Q1: q8 v2 (values-only int8 table + XW spill + fused step) on the
# community headline — the int8 window DMA is half the bf16 bytes
python -u bench.py --backend window --communities 512 --block_rows 512 \
    --fuse_gru --q8 --xw_spill --dtype bfloat16 \
    > /tmp/bench_r3_Q1_q8.log 2>&1

# Q2: A/B control — same config, bf16 table (no q8)
python -u bench.py --backend window --communities 512 --block_rows 512 \
    --fuse_gru --xw_spill --dtype bfloat16 \
    > /tmp/bench_r3_Q2_bf16_table.log 2>&1

# M1: 1M-node / 20M-edge UNIFORM fwd, typed-pack onehot (BASELINE.md
# still carries round-3's 39.9M chunked number)
python -u bench.py --nodes 1000000 --edges 10000000 --backend onehot \
    --chain 2 --dtype bfloat16 > /tmp/bench_r3_M1_1m_uniform.log 2>&1

# M2: 1M-node community fwd, on-demand + fused (round-3's 495.0M stands)
python -u bench.py --nodes 1000000 --edges 10000000 --communities 4096 \
    --backend window --block_rows 256 --window 512 --on_demand --fuse_gru \
    --chain 2 --dtype bfloat16 > /tmp/bench_r3_M2_1m_comm.log 2>&1

echo DONE > /tmp/bench_r3_experiments1.done
