#!/bin/bash
# Round-4b measurement chain (follow-ups after the main r4 chain finished).
#
# Queue, in value order:
#   1. defaults15   — bench.py's NEW defaults (int8 + dpm++2m@15): confirm
#                     the 2.0286 headline with final code state (cached).
#   2. b4           — batch-4 retry on the reference ddim-50 protocol, now
#                     that the flash blk256 kernel caps to blk128 at b*h>20
#                     (the r4 cell failed AOT by 120K scoped vmem).
#   3. combo_reslnq — FUSED_RES+FUSED_LNQ together (the two single-flag
#                     winners: +0.80% / +0.77% vs the 0.7153 epoch).
#   4. taps_dy3     — remaining int8 conv tap-mode candidate (K=3*blk_ci;
#                     "concat" removed after its VMEM OOM).
#   5. b4_split     — batch-4 autopsy script retry (post flash fix).
#   6. dpm15_b4     — serving-batch scaling on the new default fast path.
#
# ONE TPU process at a time — run this alone:
#   nohup bash scripts/tpu_r4b_chain.sh > /tmp/r4b_chain.log 2>&1 &
#   echo $! > /tmp/r4b_chain.pid
cd /root/repo

# Deadline: stop starting new cells after this, so the driver's end-of-round
# bench runs uncontended.  Default: 2h15m from launch (~3h of round left).
DEADLINE=${R4B_DEADLINE:-$(( $(date +%s) + 8100 ))}
mkdir -p /root/repo/bench_logs_r4
snap() { cp /tmp/bench_*_r4b.log /tmp/*_r4b.log /tmp/r4b_chain.log /root/repo/bench_logs_r4/ 2>/dev/null; }
guard() { snap; if [ "$(date +%s)" -ge "$DEADLINE" ]; then echo "$(date -u +%H:%M:%S) deadline reached - stopping queue"; snap; exit 0; fi; }

run_bench() {  # name, env assignments...
  local name=$1; shift
  echo "$(date -u +%H:%M:%S) bench [$name]"
  env "$@" BENCH_ITERS=3 python bench.py > "/tmp/bench_${name}_r4b.log" 2>&1
  local rc=$?
  echo "rc=$rc $(tail -1 /tmp/bench_${name}_r4b.log)"
  return $rc
}

guard; run_bench defaults15
guard; run_bench b4           BENCH_SAMPLER=ddim BENCH_STEPS=50 BENCH_BATCH=4
guard; run_bench combo_reslnq BENCH_SAMPLER=ddim BENCH_STEPS=50 LEFTREFILL_FUSED_RES=1 LEFTREFILL_FUSED_LNQ=1
guard; run_bench taps_dy3     BENCH_SAMPLER=ddim BENCH_STEPS=50 LEFTREFILL_INT8_CONV_TAPS=dy3

guard
echo "$(date -u +%H:%M:%S) b4_split (batch-4 autopsy, post flash fix)"
python scripts/tpu_r4_b4_split.py > /tmp/b4_split_r4b.log 2>&1
echo "rc=$? $(tail -2 /tmp/b4_split_r4b.log | head -1)"

guard; run_bench dpm15_b4     BENCH_BATCH=4
snap
echo "$(date -u +%H:%M:%S) R4B CHAIN DONE"

# --- appended mid-run (lazy tail read): multiview on the 15-step fast path ---
guard
echo "$(date -u +%H:%M:%S) mv_dpm15 (int8 + 15-step dpm++2m multiview e2e)"
MV_QUANT=1 MV_SAMPLER=dpm++2m MV_STEPS=15 python scripts/tpu_multiview_e2e.py > /tmp/mv_dpm15_r4b.log 2>&1
echo "rc=$? $(tail -2 /tmp/mv_dpm15_r4b.log | head -1)"
snap
echo "$(date -u +%H:%M:%S) R4B TAIL DONE"

# combo on the headline graph: flip FUSED_RES+FUSED_LNQ defaults only if this
# is green and >= the 2.03 epoch (combo won +1.48% on ddim50: 0.7259)
guard; run_bench dpm15_combo LEFTREFILL_FUSED_RES=1 LEFTREFILL_FUSED_LNQ=1
snap
echo "$(date -u +%H:%M:%S) R4B TAIL2 DONE"
