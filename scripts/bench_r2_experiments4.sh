#!/bin/bash
# Round-2 TPU measurement sequence, part 4: reruns invalidated by
# mid-sequence source edits (F2 imported a half-edited tree) + the fused
# 1M train.  Launch only after bench_r2_experiments3 finishes (one TPU
# job at a time).
set -x
cd /root/repo

# F2r: community fwd fused + on-demand regression check (X2 870.7M;
# verifies the dstl spill + emit_res/extra_init refactors cost nothing
# on the serving path)
python -u bench.py --backend window --communities 512 --block_rows 512 \
    --dtype bfloat16 --iters 3 --warmup 1 --fuse_gru --on_demand \
    > /tmp/bench_r2_F2r_fwd_regress.log 2>&1

# E4: 1M train through the FUSED step (if E3 ran, compare; the fused
# epilogue also shrinks the 1M step's GRU cost)
python -u bench.py --nodes 1000000 --edges 10000000 --types 8 \
    --communities 4096 --backend window --block_rows 256 --window 512 \
    --dtype bfloat16 --iters 3 --warmup 1 --mode train --on_demand --remat \
    --fuse_gru --chain 1 > /tmp/bench_r2_E4_1m_train_fused.log 2>&1

echo DONE > /tmp/bench_r2_experiments4.done
