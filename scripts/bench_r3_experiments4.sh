#!/bin/bash
# Round-3 TPU measurement sequence 4. ONE TPU job at a time.
#
# S1 showed the LEGACY spill beats XW at 1M (432.0 vs 339.0M — the XW
# h-gather + bucket machinery costs grow with footprint); q8 composes
# with either spill.  Measure q8+legacy at both scales.
set -x
cd /root/repo

# S3: 1M community, table + fused + legacy spill + q8 (expect ~470M+:
# q8 was +10.6% on the table+XW config at this scale)
python -u bench.py --nodes 1000000 --edges 10000000 --communities 4096 \
    --backend window --block_rows 256 --window 512 --fuse_gru --q8 \
    --chain 2 --dtype bfloat16 > /tmp/bench_r3_S3_1m_q8_legacy.log 2>&1

# S4: 262K headline, q8 + LEGACY spill (A/B vs the 893.0M q8+XW)
python -u bench.py --backend window --communities 512 --block_rows 512 \
    --fuse_gru --q8 --dtype bfloat16 \
    > /tmp/bench_r3_S4_262k_q8_legacy.log 2>&1

echo DONE > /tmp/bench_r3_experiments4.done
