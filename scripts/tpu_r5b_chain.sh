#!/bin/bash
# Round-5b follow-up chain: clean re-measure of the VAE Pallas-conv gate.
#
# The first e2e A/B (bench_logs_r5/bench_vaeconv_r5.log: 1.9966 vs the
# 2.1134 epoch, -5.5%) ran (a) with the pre-refinement gate that still
# claimed the measured-losing 64x128 shape and (b) overlapped a nice-15 CPU
# dryrun during its trace/compile phase.  Contention only ever slows, so a
# LOSS under contention is inconclusive — this re-runs the cell clean with
# the refined gate (conv.py _wide_plan skips h*w < 32768).
#
# Decision rule (gate-ledger discipline, PARITY.md r5 section):
#   >= 2.13  -> flip LEFTREFILL_VAE_PALLAS_CONV default-ON (+ re-epoch)
#   ~epoch   -> keep opt-in with the probe's kernel-level wins documented
#   < epoch  -> delete the VAE-conv machinery (wide plans + slabs + gate)
#
# Launch (AFTER tpu_r5_chain.sh exits; ONE TPU process):
#   nohup bash scripts/tpu_r5b_chain.sh > /tmp/r5b_chain.log 2>&1 &
#   echo $! > /tmp/r5b_chain.pid
cd /root/repo

DEADLINE=${R5B_DEADLINE:-$(( $(date +%s) + 14400 ))}   # +4h
mkdir -p /root/repo/bench_logs_r5
snap() { cp /tmp/bench_*_r5b.log /tmp/r5b_chain.log /root/repo/bench_logs_r5/ 2>/dev/null; }
guard() { snap; if [ "$(date +%s)" -ge "$DEADLINE" ]; then echo "$(date -u +%H:%M:%S) deadline reached - stopping queue"; snap; exit 0; fi; }

run_bench() {  # name, env assignments...
  local name=$1; shift
  echo "$(date -u +%H:%M:%S) bench [$name]"
  env "$@" BENCH_ITERS=3 python bench.py > "/tmp/bench_${name}_r5b.log" 2>&1
  local rc=$?
  echo "rc=$rc $(tail -1 /tmp/bench_${name}_r5b.log)"
  return $rc
}

guard; run_bench vaeconv_clean LEFTREFILL_VAE_PALLAS_CONV=1

snap
echo "$(date -u +%H:%M:%S) R5B CHAIN DONE"
