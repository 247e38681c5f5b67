#!/bin/bash
# Round-4 measurement chain (supersedes tpu_r4_bisect.sh; ADVICE r3 fixes:
# relative deadline, snap-aware guard from cell 1).
#
# Queue, in value order:
#   1. dpm20           — re-measure dpm++2m@20 post scan-rewrite (the OOM'd
#                        cell predates the rewrite; biggest single lever:
#                        r2-era number 1.046 vs 0.7153 ddim-50 epoch).
#      dpm20_inner1    — fallback bisect cell, only if dpm20 fails.
#   2. six-flag fusion bisect: one gate ON per cell over shipped defaults
#      (cfg_dup on, family off; epoch 0.7153).  >2% win => flip default.
#   3. vae8            — int8 VAE decoder speed (quality bound 39.3 dB done).
#   4. xla_s8conv / taps_concat — remaining unmeasured gates.
#   5. b4              — batch-4 autopsy datapoint (r3: 0.43 < b1 0.7155).
#
# ONE TPU process at a time — run this alone:
#   nohup bash scripts/tpu_r4_chain.sh > /tmp/r4_chain.log 2>&1 &
#   echo $! > /tmp/r4_chain.pid
cd /root/repo

# Deadline: stop starting new cells after this, so the driver's end-of-round
# bench runs uncontended.  Default: 9 hours from launch (12h round).
DEADLINE=${R4_DEADLINE:-$(( $(date +%s) + 32400 ))}
mkdir -p /root/repo/bench_logs_r4
snap() { cp /tmp/bench_*_r4.log /tmp/r4_chain.log /root/repo/bench_logs_r4/ 2>/dev/null; }
guard() { snap; if [ "$(date +%s)" -ge "$DEADLINE" ]; then echo "$(date -u +%H:%M:%S) deadline reached - stopping queue"; snap; exit 0; fi; }

run_bench() {  # name, env assignments...
  local name=$1; shift
  echo "$(date -u +%H:%M:%S) bench [$name]"
  env "$@" BENCH_ITERS=3 python bench.py > "/tmp/bench_${name}_r4.log" 2>&1
  local rc=$?
  echo "rc=$rc $(tail -1 /tmp/bench_${name}_r4.log)"
  return $rc
}

guard
if run_bench dpm20 BENCH_SAMPLER=dpm++2m BENCH_STEPS=20; then
  :
else
  guard; run_bench dpm20_inner1 BENCH_SAMPLER=dpm++2m BENCH_STEPS=20 BENCH_INNER=1
fi

guard; run_bench only_splitcat  LEFTREFILL_SPLIT_CAT=1
guard; run_bench only_fusedres  LEFTREFILL_FUSED_RES=1
guard; run_bench only_moments   LEFTREFILL_CONV_MOMENTS=1
guard; run_bench only_ffres     LEFTREFILL_FUSED_FFRES=1
guard; run_bench only_lnq       LEFTREFILL_FUSED_LNQ=1
guard; run_bench only_resadd    LEFTREFILL_FUSED_RESADD=1

guard; run_bench vae8           BENCH_QUANT_VAE=1
guard; run_bench xla_s8conv     LEFTREFILL_INT8_XLA_CONV=1
guard; run_bench taps_concat    LEFTREFILL_INT8_CONV_TAPS=concat

guard; run_bench b4             BENCH_BATCH=4

snap
echo "$(date -u +%H:%M:%S) R4 CHAIN DONE"

# --- appended mid-run (lazy tail read): follow-up cells ---
guard; run_bench dpm10 BENCH_SAMPLER=dpm++2m BENCH_STEPS=10
guard
echo "$(date -u +%H:%M:%S) mv_quality"
python scripts/tpu_r4_mv_quality.py > /tmp/mv_quality_r4.log 2>&1
echo "rc=$? $(tail -2 /tmp/mv_quality_r4.log | head -1)"
cp /tmp/mv_quality_r4.log /root/repo/bench_logs_r4/ 2>/dev/null
snap
echo "$(date -u +%H:%M:%S) R4 CHAIN TAIL DONE"

guard
echo "$(date -u +%H:%M:%S) b4_split"
python scripts/tpu_r4_b4_split.py > /tmp/b4_split_r4.log 2>&1
echo "rc=$? $(tail -2 /tmp/b4_split_r4.log | head -1)"
cp /tmp/b4_split_r4.log /root/repo/bench_logs_r4/ 2>/dev/null

# combined fast path: if vae8's speed cell won, this is the new serving config
guard; run_bench dpm20_vae8 BENCH_SAMPLER=dpm++2m BENCH_STEPS=20 BENCH_QUANT_VAE=1
snap
echo "$(date -u +%H:%M:%S) R4 CHAIN TAIL2 DONE"

guard
echo "$(date -u +%H:%M:%S) mv_dpm20 (int8 + 20-step dpm++2m multiview e2e)"
MV_QUANT=1 MV_SAMPLER=dpm++2m MV_STEPS=20 python scripts/tpu_multiview_e2e.py > /tmp/mv_dpm20_r4.log 2>&1
echo "rc=$? $(tail -2 /tmp/mv_dpm20_r4.log | head -1)"
cp /tmp/mv_dpm20_r4.log /root/repo/bench_logs_r4/ 2>/dev/null
snap
echo "$(date -u +%H:%M:%S) R4 CHAIN TAIL3 DONE"

# dpm15: solver accuracy 64.9 dB vs gold > ddim50's 63.0 (cpu_dpm20_quality),
# throughput extrapolates past the 2.0 north star.  dpm12 for the curve.
guard; run_bench dpm15 BENCH_SAMPLER=dpm++2m BENCH_STEPS=15
guard; run_bench dpm12 BENCH_SAMPLER=dpm++2m BENCH_STEPS=12
snap
echo "$(date -u +%H:%M:%S) R4 CHAIN TAIL4 DONE"
