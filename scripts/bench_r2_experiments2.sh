#!/bin/bash
# Round-2 TPU measurement sequence, part 2: dstl synthesized one-hots on
# the typed uniform path + the fixed 1M-node single-chip TRAIN run +
# a driver-default validation pass.  ONE TPU job at a time.
set -x
cd /root/repo

# U1: uniform fwd, onehot typed path with the dstl stream (one-hot
# synthesized in-kernel from a [tiles, tile_e] i32 dst-local stream —
# 32x less side-stream DMA).  Round-4 measured 257.0M with the int8
# one-hot stream.
python -u bench.py --backend onehot --dtype bfloat16 --iters 3 --warmup 1 \
    > /tmp/bench_r2_U1_uniform_fwd_dstl.log 2>&1

# U2: uniform train, onehot typed path (fwd kernel now dstl; grads still
# int8 streams).  Round-4 measured 104.6M.
python -u bench.py --backend onehot --dtype bfloat16 --iters 3 --warmup 1 \
    --mode train > /tmp/bench_r2_U2_uniform_train_dstl.log 2>&1

# E2: 1M-node / 20M-directed-edge single-chip TRAINING (pad bug fixed:
# node_mult now max(128, block_rows)).  on_demand kills the 4.3 GB
# table; remat the scan residuals; chain 2 (chain>=5 compiles at 1M
# crash the remote compile helper).
python -u bench.py --nodes 1000000 --edges 10000000 --types 8 \
    --communities 4096 --backend window --block_rows 256 --window 512 \
    --dtype bfloat16 --iters 3 --warmup 1 --mode train --on_demand --remat \
    --chain 2 > /tmp/bench_r2_E2_1m_train.log 2>&1

# D: driver-default validation (auto backends + window_community detail,
# which now runs on_demand+fuse_gru — the 870.7M config).  This is the
# exact invocation the driver scores at round end.
python -u bench.py --dtype bfloat16 --iters 3 --warmup 1 \
    > /tmp/bench_r2_D_driver_default.log 2>&1

echo DONE > /tmp/bench_r2_experiments2.done
