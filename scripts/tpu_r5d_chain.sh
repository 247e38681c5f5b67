#!/bin/bash
# Round-5d chain: re-run the two V=2 multiview streaming cells lost to the
# 00:10 UTC axon outage (commit c2f751c).  Both fill the menu table in
# CLAUDE.md item 2 / PARITY.md r5 with streaming-attention (KV_RESIDENT_MAX
# 8192) numbers:
#   1. mv_v2_dpm20_stream   — int8 premium-accuracy config (r4 resident: 0.5213)
#   2. mv_v2_bf16dpm15_stream — bf16 fast path (quantifies the int8 win at V=2)
# Pattern: tpu_r4_chain.sh — relative deadline, snapshot per cell, ONE TPU
# process at a time.  Deadline is short: this session ends in ~1h and the
# driver's end-of-round bench must not be contended.
cd /root/repo

DEADLINE=${R5D_DEADLINE:-$(( $(date +%s) + 2400 ))}   # +40min default
mkdir -p /root/repo/bench_logs_r5
snap() { cp /tmp/r5d_chain.log /root/repo/bench_logs_r5/ 2>/dev/null; }
guard() { snap; if [ "$(date +%s)" -ge "$DEADLINE" ]; then echo "$(date -u +%H:%M:%S) deadline reached - stopping queue"; snap; exit 0; fi; }

run_cell() {  # name, command...
  local name=$1; shift
  echo "$(date -u +%H:%M:%S) $name"
  "$@" > "/tmp/${name}_r5d.log" 2>&1
  local rc=$?
  echo "rc=$rc $(tail -2 /tmp/${name}_r5d.log | head -1)"
  cp "/tmp/${name}_r5d.log" /root/repo/bench_logs_r5/ 2>/dev/null
  return $rc
}

guard; run_cell mv_v2_dpm20_stream env MV_VIEWS=2 MV_QUANT=1 MV_SAMPLER=dpm++2m MV_STEPS=20 python scripts/tpu_multiview_e2e.py
guard; run_cell mv_v2_bf16dpm15_stream env MV_VIEWS=2 MV_QUANT=0 MV_SAMPLER=dpm++2m MV_STEPS=15 python scripts/tpu_multiview_e2e.py

snap
echo "$(date -u +%H:%M:%S) R5D CHAIN DONE"
