#!/bin/bash
# Round-2 TPU measurement sequence, part 3: the TRAINABLE fused
# window+GRU step (emit_res custom VJP) + dstl grad/spill streams.
# ONE TPU job at a time.
set -x
cd /root/repo

# F1: community TRAIN through the fused step + on-demand windows
# (kernel writes (a|z|r|htil) residuals; no separate GRU pass, no [N,D]
# a round-trip).  Controls: X3 on-demand unfused train 252.8M, X4
# legacy 251.4M.
python -u bench.py --backend window --communities 512 --block_rows 512 \
    --dtype bfloat16 --iters 3 --warmup 1 --mode train --on_demand \
    --fuse_gru > /tmp/bench_r2_F1_fusedtrain.log 2>&1

# F2: community fwd fused + on-demand (regression check for the dstl
# spill conversion + emit_res refactor; X2 measured 870.7M)
python -u bench.py --backend window --communities 512 --block_rows 512 \
    --dtype bfloat16 --iters 3 --warmup 1 --fuse_gru --on_demand \
    > /tmp/bench_r2_F2_fwd_regress.log 2>&1

# F3: uniform TRAIN onehot (g_dstl grad stream + narrow GRU h residual;
# U2 control was 104.1M before those landed)
python -u bench.py --backend onehot --dtype bfloat16 --iters 3 --warmup 1 \
    --mode train > /tmp/bench_r2_F3_uniform_train.log 2>&1

# F4: power-law fwd + on-demand (dstl spill at 37% spill; X5 208.8M)
python -u bench.py --backend window --powerlaw 1.2 \
    --dtype bfloat16 --iters 3 --warmup 1 --on_demand \
    > /tmp/bench_r2_F4_powerlaw.log 2>&1

# F5: community TRAIN fused WITHOUT on-demand (isolates the fused-step
# win from the table mode; X4 legacy-unfused 251.4M)
python -u bench.py --backend window --communities 512 --block_rows 512 \
    --dtype bfloat16 --iters 3 --warmup 1 --mode train --fuse_gru \
    --xw_spill > /tmp/bench_r2_F5_fusedtrain_table.log 2>&1



# E3: 1M-node / 20M-edge single-chip TRAINING, chain 1 (the chain-2
# compile crashed the remote compile helper with HTTP 500 after ~80 min
# -- round-4's chain>=5 failure mode now appears at chain 2 for train at
# this scale).  chain 1 carries the ~27.6 ms fetch roundtrip on a ~1.4 s
# call: ~2% inflation, acceptable.
python -u bench.py --nodes 1000000 --edges 10000000 --types 8 \
    --communities 4096 --backend window --block_rows 256 --window 512 \
    --dtype bfloat16 --iters 3 --warmup 1 --mode train --on_demand --remat \
    --chain 1 > /tmp/bench_r2_E3_1m_train.log 2>&1


echo DONE > /tmp/bench_r2_experiments3.done
