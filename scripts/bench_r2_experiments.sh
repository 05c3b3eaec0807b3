#!/bin/bash
# Round-2 (driver round) TPU measurement sequence, v2: XW spill +
# on-demand windows.  ONE TPU job at a time.  v1's A/B runs measured the
# fragmented typed spill (407.9M / 386.4M) and were killed.
set -x
cd /root/repo

# A2: community fwd fused, table + legacy spill (regression control for
# the round's refactors; round-3 measured 755.7M, driver 786.8M)
python -u bench.py --backend window --communities 512 --block_rows 512 \
    --dtype bfloat16 --iters 3 --warmup 1 --fuse_gru \
    > /tmp/bench_r2_A2_legacy_fwd.log 2>&1

# X1: community fwd fused, table + XW spill (isolates spill swap)
python -u bench.py --backend window --communities 512 --block_rows 512 \
    --dtype bfloat16 --iters 3 --warmup 1 --fuse_gru --xw_spill \
    > /tmp/bench_r2_X1_xw_fwd.log 2>&1

# X2: community fwd fused + on-demand (headline candidate: no table,
# 25% less tile DMA, XW spill)
python -u bench.py --backend window --communities 512 --block_rows 512 \
    --dtype bfloat16 --iters 3 --warmup 1 --fuse_gru --on_demand \
    > /tmp/bench_r2_X2_ondemand_fwd.log 2>&1

# X4: community train, table + legacy spill (control vs round-4 249.1M)
python -u bench.py --backend window --communities 512 --block_rows 512 \
    --dtype bfloat16 --iters 3 --warmup 1 --mode train \
    > /tmp/bench_r2_X4_legacy_train.log 2>&1

# X3: community train + on-demand (no table anywhere in training)
python -u bench.py --backend window --communities 512 --block_rows 512 \
    --dtype bfloat16 --iters 3 --warmup 1 --mode train --on_demand \
    > /tmp/bench_r2_X3_ondemand_train.log 2>&1

# X5: scale-free fwd + on-demand (37% spill regime exercises the XW
# spill hardest; round-3 measured 169.1M with table+legacy spill)
python -u bench.py --backend window --powerlaw 1.2 \
    --dtype bfloat16 --iters 3 --warmup 1 --on_demand \
    > /tmp/bench_r2_X5_powerlaw_ondemand.log 2>&1

# E: 1M-node / 20M-edge single-chip TRAINING (round-4 OOM at 22.7 GB vs
# 15.75: 9 GB layout + 4.3 GB table + 9 GB scan residuals; on_demand
# kills the table, remat the residuals).  chain>=5 train compiles at 1M
# crash the remote compile helper (HTTP 500) -- use --chain 2.
python -u bench.py --nodes 1000000 --edges 10000000 --types 8 \
    --communities 4096 --backend window --block_rows 256 --window 512 \
    --dtype bfloat16 --iters 3 --warmup 1 --mode train --on_demand --remat \
    --chain 2 > /tmp/bench_r2_E_1m_train.log 2>&1

echo DONE > /tmp/bench_r2_experiments.done
