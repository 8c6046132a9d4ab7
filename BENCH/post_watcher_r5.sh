#!/bin/bash
# Round-5 quiet-host re-measurement sequence. Run AFTER the watcher has
# captured its 3 quiet scaling pairs (it holds BENCH/.heavy.lock during
# each attempt, so flock here serializes us behind it).
# The r5 self-check bench ran at 9-13% steal on the cdc group and the
# compaction/read scaling at 5-6% steal; the host is finally idle after
# a reboot, so re-measure all three cleanly.
set -x
cd /root/repo
flock BENCH/.heavy.lock python BENCH/compact_scaling.py 8000000 2 8 4 \
  >> BENCH/compact_scaling_r5_quiet.jsonl 2>> BENCH/compact_scaling_r5_quiet.err
flock BENCH/.heavy.lock python BENCH/read_scaling.py 2 8 8000000,24000000 2 \
  >> BENCH/read_scaling_r5_quiet.jsonl 2>> BENCH/read_scaling_r5_quiet.err
flock BENCH/.heavy.lock python bench.py \
  > BENCH/bench_r5_selfcheck_quiet.json 2> BENCH/bench_r5_selfcheck_quiet.err
echo "EXIT=$?" >> BENCH/bench_r5_selfcheck_quiet.err
