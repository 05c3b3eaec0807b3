#!/bin/bash
# Round-2 TPU measurement sequence, part 6: the fused TYPED step on the
# uniform headline (onehot backend now fuses the GRU into the scatter
# kernel's epilogue by default).  ONE TPU job at a time.
set -x
cd /root/repo

# H1: uniform fwd, onehot FUSED (control: 252.8M unfused; the GRU cell
# was 3.6 ms of the ~31.6 ms step -> expect ~+12%)
python -u bench.py --backend onehot --dtype bfloat16 --iters 3 --warmup 1 \
    > /tmp/bench_r2_H1_uniform_fwd_fused.log 2>&1

# H2: uniform fwd, onehot UNFUSED (A/B control on the same tree)
python -u bench.py --backend onehot --dtype bfloat16 --iters 3 --warmup 1 \
    --no_fuse > /tmp/bench_r2_H2_uniform_fwd_nofuse.log 2>&1

# H3: uniform train, onehot fused-by-default (the VJP fwd rule
# recomputes unfused -- expect parity with 104.9M)
python -u bench.py --backend onehot --dtype bfloat16 --iters 3 --warmup 1 \
    --mode train > /tmp/bench_r2_H3_uniform_train.log 2>&1

echo DONE > /tmp/bench_r2_experiments6.done
