#!/bin/bash
# Round-5c chain (verify + record):
#   1. kvchunk_smoke2 — kernel TF/s at the shipped blk1024/chunk1024 sizing
#      (the r5b cell died on a stale assertion; fixed).
#   2. bench_postdel  — default headline bench after the VAE Pallas-conv
#      deletion (expects ~2.11; the deleted gate was default-OFF so the
#      graph is unchanged — this is the end-to-end drive of the touched
#      VAE decode path).
# Pattern: tpu_r4_chain.sh — relative deadline, snapshot per cell, ONE TPU
# process at a time.
cd /root/repo

DEADLINE=${R5C_DEADLINE:-$(( $(date +%s) + 10800 ))}   # +3h
mkdir -p /root/repo/bench_logs_r5
snap() { cp /tmp/r5c_chain.log /root/repo/bench_logs_r5/ 2>/dev/null; }
guard() { snap; if [ "$(date +%s)" -ge "$DEADLINE" ]; then echo "$(date -u +%H:%M:%S) deadline reached - stopping queue"; snap; exit 0; fi; }

run_cell() {  # name, command...
  local name=$1; shift
  echo "$(date -u +%H:%M:%S) $name"
  "$@" > "/tmp/${name}_r5c.log" 2>&1
  local rc=$?
  echo "rc=$rc $(tail -2 /tmp/${name}_r5c.log | head -1)"
  cp "/tmp/${name}_r5c.log" /root/repo/bench_logs_r5/ 2>/dev/null
  return $rc
}

guard; run_cell kvchunk_smoke2 python scripts/tpu_r5_kvchunk_smoke.py
guard; run_cell bench_postdel env BENCH_ITERS=3 python bench.py

snap
echo "$(date -u +%H:%M:%S) R5C CHAIN DONE"
