#!/bin/bash
# Round-5b chain: the V=4 multiview cells (VERDICT #7), unblocked by the
# streaming-K/V flash path (ops/flash_attention.py _flash_kvchunk_kernel).
# Pattern: tpu_r4_chain.sh — relative deadline, snapshot guard before every
# cell, ONE TPU process at a time (memory: bench-chain-discipline).
#
#   1. kvchunk_smoke — fail-fast compile+parity+timing of the chunked kernel
#                      at the exact failing shape (b*h=10, N=32768).
#   2. mv_v4         — V=4 int8 ddim50 scenes/s.
#   3. mv_v4_dpm15   — V=4 int8 dpm++2m@15 scenes/s (fast path).
#   4. mv_v4_quality — V=4 int8-vs-fp32 scene PSNR (fp32 now takes the
#                      chunked flash path instead of the 21.5GB XLA naive).
#
# Launch:
#   nohup bash scripts/tpu_r5b_chain.sh > /tmp/r5b_chain.log 2>&1 &
#   echo $! > /tmp/r5b_chain.pid
cd /root/repo

DEADLINE=${R5B_DEADLINE:-$(( $(date +%s) + 14400 ))}   # +4h
mkdir -p /root/repo/bench_logs_r5
snap() { cp /tmp/r5b_chain.log /root/repo/bench_logs_r5/ 2>/dev/null; }
guard() { snap; if [ "$(date +%s)" -ge "$DEADLINE" ]; then echo "$(date -u +%H:%M:%S) deadline reached - stopping queue"; snap; exit 0; fi; }

run_cell() {  # name, command...
  local name=$1; shift
  echo "$(date -u +%H:%M:%S) $name"
  "$@" > "/tmp/${name}_r5b.log" 2>&1
  local rc=$?
  echo "rc=$rc $(tail -2 /tmp/${name}_r5b.log | head -1)"
  cp "/tmp/${name}_r5b.log" /root/repo/bench_logs_r5/ 2>/dev/null
  return $rc
}

guard; run_cell kvchunk_smoke python scripts/tpu_r5_kvchunk_smoke.py || { echo "smoke failed - aborting chain"; snap; exit 1; }
guard; run_cell mv_v4 env MV_VIEWS=4 MV_QUANT=1 python scripts/tpu_multiview_e2e.py
guard; run_cell mv_v4_dpm15 env MV_VIEWS=4 MV_QUANT=1 MV_SAMPLER=dpm++2m MV_STEPS=15 python scripts/tpu_multiview_e2e.py
guard; run_cell mv_v4_quality env MV_VIEWS=4 python scripts/tpu_r4_mv_quality.py

snap
echo "$(date -u +%H:%M:%S) R5B CHAIN DONE"

# --- appended (lazy tail): the blk1024/chunk1024 traffic-optimal resizing
# landed while the first mv_v4 cell was running old sizing (47.1 TF/s,
# ~21GB K/V DMA per ds1 call).  Re-measure the kernel and the ddim50 cell;
# the dpm15/quality cells above already picked the new code up (fresh
# python per cell).
guard; run_cell kvchunk_smoke2 python scripts/tpu_r5_kvchunk_smoke.py
guard; run_cell mv_v4_rerun env MV_VIEWS=4 MV_QUANT=1 python scripts/tpu_multiview_e2e.py
snap
echo "$(date -u +%H:%M:%S) R5B TAIL DONE"

# --- appended (lazy tail): the vaeconv_clean cell from the ORIGINAL
# committed r5b chain (a1c3e37), which this file accidentally overwrote.
# Clean re-measure of the VAE Pallas-conv gate — the first A/B (1.9966 vs
# 2.1134, -5.5%) ran with the pre-refinement gate AND overlapped a nice-15
# CPU dryrun; contention only slows, so a loss under contention is
# inconclusive.  Decision rule (PARITY.md r5):
#   >= 2.13 -> flip default-ON;  ~epoch -> keep opt-in;  < epoch -> DELETE.
guard
echo "$(date -u +%H:%M:%S) bench [vaeconv_clean]"
env LEFTREFILL_VAE_PALLAS_CONV=1 BENCH_ITERS=3 python bench.py > /tmp/bench_vaeconv_clean_r5b.log 2>&1
echo "rc=$? $(tail -1 /tmp/bench_vaeconv_clean_r5b.log)"
cp /tmp/bench_vaeconv_clean_r5b.log /root/repo/bench_logs_r5/ 2>/dev/null
snap
echo "$(date -u +%H:%M:%S) R5B TAIL2 DONE"
