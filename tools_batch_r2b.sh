#!/bin/bash
# Round-2 perf batch B: re-measure after the n_pyr_levels=3 parity change.
# Strictly one TPU process at a time, with fault-recovery retries.
cd /root/repo
run() {
  for attempt in 1 2 3; do
    out=$(timeout 1500 python tools_bench_var.py "$@" 2>/tmp/bv_err.log)
    if [ -n "$out" ]; then echo "$out"; return; fi
    echo "# $* attempt $attempt failed: $(tail -1 /tmp/bv_err.log)" >&2
    sleep 130
  done
  echo "# $* FAILED all attempts" >&2
}
run                                      # post-level-change baseline
run epi_short_steps=16 epi_long_k=128
run epi_max_steps=64 epi_short_steps=16 epi_long_k=128
run epi_max_steps=64 epi_short_steps=8 epi_long_k=128
echo "# batch B done"
