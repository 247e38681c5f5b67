#!/bin/bash
# Round-5 measurement chain (pattern: tpu_r4_chain.sh — relative deadline,
# snapshot guard before every cell, ONE TPU process at a time).
#
# Queue, in value order:
#   1. headline  — bench defaults (int8 + dpm++2m@15, RES/LNQ on): verifies
#                  the r5 gate-deletion cleanup didn't regress the 2.1232
#                  epoch AND pre-warms the exact graph the driver's
#                  end-of-round bench will hit.
#   2. ddim50    — reference protocol cell (VERDICT #5: both protocols
#                  recorded per round; r4 epoch 0.7259).
#   3. solver_quality — full-865M on-chip solver-accuracy bound with the
#                  eta=1.0 arms (VERDICT #2).
#
# Launch:
#   nohup bash scripts/tpu_r5_chain.sh > /tmp/r5_chain.log 2>&1 &
#   echo $! > /tmp/r5_chain.pid
cd /root/repo

DEADLINE=${R5_DEADLINE:-$(( $(date +%s) + 28800 ))}   # +8h
mkdir -p /root/repo/bench_logs_r5
snap() { cp /tmp/bench_*_r5.log /tmp/r5_chain.log /root/repo/bench_logs_r5/ 2>/dev/null; }
guard() { snap; if [ "$(date +%s)" -ge "$DEADLINE" ]; then echo "$(date -u +%H:%M:%S) deadline reached - stopping queue"; snap; exit 0; fi; }

run_bench() {  # name, env assignments...
  local name=$1; shift
  echo "$(date -u +%H:%M:%S) bench [$name]"
  env "$@" BENCH_ITERS=3 python bench.py > "/tmp/bench_${name}_r5.log" 2>&1
  local rc=$?
  echo "rc=$rc $(tail -1 /tmp/bench_${name}_r5.log)"
  return $rc
}

guard; run_bench headline
guard; run_bench ddim50 BENCH_SAMPLER=ddim BENCH_STEPS=50

# headline retry: first attempt died on a remote-compile-server connection
# drop (bench_logs_r5/bench_headline_r5.log) — infra flake, not a graph error
guard; run_bench headline
guard; run_bench headline_retry2

guard
echo "$(date -u +%H:%M:%S) solver_quality"
python scripts/tpu_r5_solver_quality.py > /tmp/solver_quality_r5.log 2>&1
echo "rc=$? $(tail -2 /tmp/solver_quality_r5.log | head -1)"
cp /tmp/solver_quality_r5.log /root/repo/bench_logs_r5/ 2>/dev/null

# VAE-conv coverage probe: can Pallas beat XLA at the decoder's big shapes?
guard
echo "$(date -u +%H:%M:%S) vaeconv_probe"
python scripts/tpu_r5_vaeconv_probe.py > /tmp/vaeconv_probe_r5.log 2>&1
echo "rc=$? $(tail -2 /tmp/vaeconv_probe_r5.log | head -1)"
cp /tmp/vaeconv_probe_r5.log /root/repo/bench_logs_r5/ 2>/dev/null

# e2e A/B of the gated VAE Pallas convs on the headline protocol (decode is
# ~15% of a dpm15 canvas; epoch to beat = the headline cell above)
guard; run_bench vaeconv LEFTREFILL_VAE_PALLAS_CONV=1


# --- appended (lazy tail): VERDICT #6 + #7 cells ---

# int8 LoRA serving: adapter swaps now merge->requantize over the fp master
guard
echo "$(date -u +%H:%M:%S) serving_int8_lora (b8)"
BENCH_QUANT=1 python scripts/tpu_serving_bench.py > /tmp/serving_int8_r5.log 2>&1
echo "rc=$? $(tail -2 /tmp/serving_int8_r5.log | head -1)"
cp /tmp/serving_int8_r5.log /root/repo/bench_logs_r5/ 2>/dev/null

# V=4 multiview e2e (int8, ddim50 + dpm15) and its quality bound
guard
echo "$(date -u +%H:%M:%S) mv_v4 (int8 ddim50)"
MV_VIEWS=4 MV_QUANT=1 python scripts/tpu_multiview_e2e.py > /tmp/mv_v4_r5.log 2>&1
echo "rc=$? $(tail -2 /tmp/mv_v4_r5.log | head -1)"
cp /tmp/mv_v4_r5.log /root/repo/bench_logs_r5/ 2>/dev/null

guard
echo "$(date -u +%H:%M:%S) mv_v4_dpm15"
MV_VIEWS=4 MV_QUANT=1 MV_SAMPLER=dpm++2m MV_STEPS=15 python scripts/tpu_multiview_e2e.py > /tmp/mv_v4_dpm15_r5.log 2>&1
echo "rc=$? $(tail -2 /tmp/mv_v4_dpm15_r5.log | head -1)"
cp /tmp/mv_v4_dpm15_r5.log /root/repo/bench_logs_r5/ 2>/dev/null

guard
echo "$(date -u +%H:%M:%S) mv_v4_quality"
MV_VIEWS=4 python scripts/tpu_r4_mv_quality.py > /tmp/mv_v4_quality_r5.log 2>&1
echo "rc=$? $(tail -2 /tmp/mv_v4_quality_r5.log | head -1)"
cp /tmp/mv_v4_quality_r5.log /root/repo/bench_logs_r5/ 2>/dev/null

guard
echo "$(date -u +%H:%M:%S) profiler_probe"
python scripts/tpu_r5_profiler_probe.py > /tmp/profiler_probe_r5.log 2>&1
echo "rc=$? $(tail -2 /tmp/profiler_probe_r5.log | head -1)"
cp /tmp/profiler_probe_r5.log /root/repo/bench_logs_r5/ 2>/dev/null

snap
echo "$(date -u +%H:%M:%S) R5 CHAIN DONE"
