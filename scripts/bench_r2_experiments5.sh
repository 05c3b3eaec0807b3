#!/bin/bash
# Round-2 TPU measurement sequence, part 5: fused+on-demand sweeps of
# the remaining configs.  ONE TPU job at a time.
set -x
cd /root/repo

# G1: 1M fwd, fused + on-demand (round-3 table stack measured 495.0M)
python -u bench.py --nodes 1000000 --edges 10000000 --types 8 \
    --communities 4096 --backend window --block_rows 256 --window 512 \
    --dtype bfloat16 --iters 3 --warmup 1 --fuse_gru --on_demand \
    > /tmp/bench_r2_G1_1m_fwd_fused.log 2>&1

# G2: scale-free fwd, fused + on-demand (unfused on-demand measured
# 209.0M; round-3 table 169.1M)
python -u bench.py --backend window --powerlaw 1.2 --dtype bfloat16 \
    --iters 3 --warmup 1 --fuse_gru --on_demand \
    > /tmp/bench_r2_G2_powerlaw_fwd_fused.log 2>&1

# G3: scale-free TRAIN, fused + on-demand (round-4 measured 72.7M)
python -u bench.py --backend window --powerlaw 1.2 --dtype bfloat16 \
    --iters 3 --warmup 1 --mode train --fuse_gru --on_demand \
    > /tmp/bench_r2_G3_powerlaw_train_fused.log 2>&1

# G4: community 1% cross, fused + on-demand (round-2 table stack 454.5M)
python -u bench.py --backend window --communities 512 --block_rows 512 \
    --p_intra 0.99 --dtype bfloat16 --iters 3 --warmup 1 --fuse_gru \
    --on_demand > /tmp/bench_r2_G4_comm1pct_fused.log 2>&1

echo DONE > /tmp/bench_r2_experiments5.done
