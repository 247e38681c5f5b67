#!/bin/bash
# Round-5e chain: two menu-completeness cells now the relay is healthy.
#   1. mv_v4_dpm20_stream    — V=4 int8 premium-accuracy point (ladder had
#                              only ddim50 0.0771 and dpm15 0.2385).
#   2. mv_v2_bf16_ddim50_stream — bf16 reference-protocol V=2 with streaming
#                              attention (the recorded 0.2064 predates it).
# Pattern: tpu_r4_chain.sh — relative deadline, snapshot per cell, ONE TPU
# process at a time; short deadline so the driver's end-of-round bench is
# never contended.
cd /root/repo

DEADLINE=${R5E_DEADLINE:-$(( $(date +%s) + 1500 ))}   # +25min default
mkdir -p /root/repo/bench_logs_r5
snap() { cp /tmp/r5e_chain.log /root/repo/bench_logs_r5/ 2>/dev/null; }
guard() { snap; if [ "$(date +%s)" -ge "$DEADLINE" ]; then echo "$(date -u +%H:%M:%S) deadline reached - stopping queue"; snap; exit 0; fi; }

run_cell() {  # name, command...
  local name=$1; shift
  echo "$(date -u +%H:%M:%S) $name"
  "$@" > "/tmp/${name}_r5e.log" 2>&1
  local rc=$?
  echo "rc=$rc $(tail -2 /tmp/${name}_r5e.log | head -1)"
  cp "/tmp/${name}_r5e.log" /root/repo/bench_logs_r5/ 2>/dev/null
  return $rc
}

guard; run_cell mv_v4_dpm20_stream env MV_VIEWS=4 MV_QUANT=1 MV_SAMPLER=dpm++2m MV_STEPS=20 python scripts/tpu_multiview_e2e.py
guard; run_cell mv_v2_bf16_ddim50_stream env MV_VIEWS=2 MV_QUANT=0 MV_SAMPLER=ddim MV_STEPS=50 python scripts/tpu_multiview_e2e.py

snap
echo "$(date -u +%H:%M:%S) R5E CHAIN DONE"
