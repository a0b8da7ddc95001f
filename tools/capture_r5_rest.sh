#!/bin/bash
# Round-5 remaining on-chip captures, serialized after capture_r5_train.sh:
# stream first-event latency (VERDICT #4), concurrent serving + soak with
# the recycle knob available (VERDICT #7/#3), Pallas kernel re-stamp
# (standing), the same-buffer leak discriminator, and a bench.py cache
# prewarm (non-default knob: does not touch bench_last_valid.json).
set -u
cd "$(dirname "$0")/.."
L=.bench_logs

echo "=== stream live ===" >&2
SOME_BENCH_TIMEOUT=1100 timeout 1200 python tools/bench_stream_live.py \
  > "$L/stream_r5.json" 2> "$L/stream_r5.err"
echo "=== stream rc=$?" >&2; tail -c 400 "$L/stream_r5.json" >&2; echo >&2

echo "=== serve concurrent + soak ===" >&2
SOME_BENCH_TIMEOUT=1500 timeout 1600 python tools/bench_serve.py \
  --clients 8 --rounds 5 --soak 296 \
  > "$L/serve_r5.json" 2> "$L/serve_r5.err"
echo "=== serve rc=$?" >&2; tail -c 400 "$L/serve_r5.json" >&2; echo >&2

echo "=== restamp kernels ===" >&2
SOME_BENCH_TIMEOUT=1100 timeout 1200 python tools/restamp_kernels.py \
  > "$L/restamp_r5.json" 2> "$L/restamp_r5.err"
echo "=== restamp rc=$?" >&2; tail -c 400 "$L/restamp_r5.json" >&2; echo >&2

echo "=== rss same-buffer leg ===" >&2
SOME_BENCH_TIMEOUT=1100 timeout 1200 python tools/probe_rss_device.py \
  --calls 300 --every 100 --same-buffer \
  > "$L/rss_same_r5.json" 2> "$L/rss_same_r5.err"
echo "=== rss-same rc=$?" >&2; tail -c 400 "$L/rss_same_r5.json" >&2; echo >&2

echo "=== bench prewarm (cache only) ===" >&2
SOME_BENCH_PREWARM=1 SOME_BENCH_TIMEOUT=1700 timeout 1800 python bench.py \
  > "$L/bench_prewarm_r5.json" 2> "$L/bench_prewarm_r5.err"
echo "=== bench-prewarm rc=$?" >&2; tail -c 600 "$L/bench_prewarm_r5.json" >&2
echo "=== capture_r5_rest done" >&2
