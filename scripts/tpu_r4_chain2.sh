#!/bin/bash
# Round-4 queue, part 2 (runs after tpu_r4_bisect.sh): the two remaining
# unmeasured r3 gates, each a full bench protocol on the shipped defaults.
#   - LEFTREFILL_INT8_XLA_CONV=1: route plan-less int8 convs (stride-2
#     Downsample, stem-adjacent shapes) through XLA's native s8xs8->s32 conv
#     instead of the weight-dequantize fp fallback (ops/quant.py
#     conv_int8_xla).  r2 measured XLA int8 dots at ~400 TOPS; the conv
#     emitter is the unverified piece.
#   - LEFTREFILL_INT8_CONV_TAPS=concat: deep-K single-matmul im2col taps in
#     the int8 copy3 kernel (default sum9).
#   - both combined if either wins alone would be a follow-up cell.
#
# ONE TPU process at a time:
#   nohup bash scripts/tpu_r4_chain2.sh > /tmp/r4_chain2.log 2>&1 &
cd /root/repo

run_bench() {
  local name=$1; shift
  echo "$(date -u +%H:%M:%S) bench [$name]"
  env "$@" BENCH_ITERS=3 python bench.py > "/tmp/bench_${name}_r4.log" 2>&1
  echo "rc=$? $(tail -1 /tmp/bench_${name}_r4.log)"
}

run_bench xla_s8conv    LEFTREFILL_INT8_XLA_CONV=1
run_bench taps_concat   LEFTREFILL_INT8_CONV_TAPS=concat

echo "$(date -u +%H:%M:%S) R4 CHAIN2 DONE"
