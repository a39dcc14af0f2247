#!/bin/bash
# Run tools_stage_timing.py / tools_bench_var.py variants one process at a
# time with retries: the tunneled TPU worker intermittently faults on the
# FIRST execution of a freshly-compiled program and needs ~2 min to
# recover; the retry then runs from the persistent compile cache.
#   tools_run_variants.sh stage full no_df ...     (stage timing variants)
#   tools_run_variants.sh var epi_max_steps=64 ... (one bench_var config)
mode=$1; shift
for v in "$@"; do
  for attempt in 1 2 3; do
    if [ "$mode" = stage ]; then
      out=$(timeout 900 python tools_stage_timing.py "$v" 2>/dev/null)
    else
      out=$(timeout 900 python tools_bench_var.py $v 2>/dev/null)
    fi
    if echo "$out" | grep -vq FAILED && [ -n "$out" ]; then
      echo "$out"; break
    fi
    echo "# $v attempt $attempt failed; worker recovery wait" >&2
    sleep 130
  done
  sleep 5
done
