#!/bin/bash
# Round-4c final cells: complete the serving-config menu at the new defaults
# (FUSED_RES+FUSED_LNQ ON).
#   dpm20_final — the accuracy-premium config (71.4 dB solver bound).
#   bf16_dpm15  — the no-quant conservative config on the headline sampler.
# Deadline-guarded hard at launch+60min so the driver's bench runs clean.
cd /root/repo
DEADLINE=${R4C_DEADLINE:-$(( $(date +%s) + 3600 ))}
mkdir -p /root/repo/bench_logs_r4
snap() { cp /tmp/bench_*_r4c.log /tmp/r4c_chain.log /root/repo/bench_logs_r4/ 2>/dev/null; }
guard() { snap; if [ "$(date +%s)" -ge "$DEADLINE" ]; then echo "$(date -u +%H:%M:%S) deadline reached - stopping queue"; snap; exit 0; fi; }

run_bench() {
  local name=$1; shift
  echo "$(date -u +%H:%M:%S) bench [$name]"
  env "$@" BENCH_ITERS=3 python bench.py > "/tmp/bench_${name}_r4c.log" 2>&1
  local rc=$?
  echo "rc=$rc $(tail -1 /tmp/bench_${name}_r4c.log)"
  return $rc
}

guard; run_bench dpm20_final BENCH_STEPS=20
guard; run_bench bf16_dpm15  BENCH_QUANT=0
snap
echo "$(date -u +%H:%M:%S) R4C DONE"
