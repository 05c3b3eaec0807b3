#!/bin/bash
# Round-2 (driver round) TPU measurement sequence: typed spill + on-demand
# windows on the community/uniform headline configs.  ONE TPU job at a
# time; run AFTER any other bench finishes.  ~6 bench invocations.
set -x
cd /root/repo

# A: community fwd, typed spill (vs baseline 755.7M / driver 786.8M fuse_gru)
python -u bench.py --backend window --communities 512 --block_rows 512 \
    --dtype bfloat16 --iters 3 --warmup 1 --fuse_gru \
    > /tmp/bench_r2_A_typedspill_fwd.log 2>&1

# B: community fwd, on-demand windows (no table; unfused GRU)
python -u bench.py --backend window --communities 512 --block_rows 512 \
    --dtype bfloat16 --iters 3 --warmup 1 --on_demand \
    > /tmp/bench_r2_B_ondemand_fwd.log 2>&1

# B3: community fwd, on-demand + fused GRU (both wins)
python -u bench.py --backend window --communities 512 --block_rows 512 \
    --dtype bfloat16 --iters 3 --warmup 1 --on_demand --fuse_gru \
    > /tmp/bench_r2_B3_ondemand_fusedgru.log 2>&1

# B2: same without on_demand (unfused GRU control for B)
python -u bench.py --backend window --communities 512 --block_rows 512 \
    --dtype bfloat16 --iters 3 --warmup 1 \
    > /tmp/bench_r2_B2_control_fwd.log 2>&1

# C: community train, typed spill (vs baseline 249.1M)
python -u bench.py --backend window --communities 512 --block_rows 512 \
    --dtype bfloat16 --iters 3 --warmup 1 --mode train \
    > /tmp/bench_r2_C_typedspill_train.log 2>&1

# D: community train, on-demand (no table anywhere in training)
python -u bench.py --backend window --communities 512 --block_rows 512 \
    --dtype bfloat16 --iters 3 --warmup 1 --mode train --on_demand \
    > /tmp/bench_r2_D_ondemand_train.log 2>&1


# E: 1M-node / 20M-edge single-chip TRAINING (round-4 OOM at 22.7 GB vs
# 15.75: 9 GB layout + 4.3 GB table + 9 GB scan residuals; on_demand kills
# the table, remat the residuals).  chain>=5 train compiles at 1M crash
# the remote compile helper (HTTP 500) -- use --chain 2.
python -u bench.py --nodes 1000000 --edges 10000000 --types 8 \
    --communities 4096 --backend window --block_rows 256 --window 512 \
    --dtype bfloat16 --iters 3 --warmup 1 --mode train --on_demand --remat \
    --chain 2 > /tmp/bench_r2_E_1m_train.log 2>&1

echo DONE > /tmp/bench_r2_experiments.done
