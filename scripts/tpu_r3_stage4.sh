#!/bin/bash
# Post-recovery stage 4 (run after tpu_r3_stage3.sh): the remaining
# unmeasured surfaces that stage 1-3 don't cover.
#   nohup bash scripts/tpu_r3_stage4.sh > /tmp/stage4.log 2>&1 &
cd /root/repo

echo "$(date -u +%H:%M:%S) multi-cond sampler bench (K=3 folded CFG batch)"
python scripts/tpu_multicond_bench.py > /tmp/multicond_wd.log 2>&1
echo "rc=$? $(tail -2 /tmp/multicond_wd.log)"

echo "$(date -u +%H:%M:%S) serving batch-8 + LoRA adapter bench (post-fusion re-measure)"
python scripts/tpu_serving_bench.py > /tmp/serving_wd.log 2>&1
echo "rc=$? $(tail -2 /tmp/serving_wd.log)"

echo "$(date -u +%H:%M:%S) bench with LEFTREFILL_FLASH_EXP2=1 (e2e pair for the kernel A/B)"
LEFTREFILL_FLASH_EXP2=1 BENCH_ITERS=3 python bench.py > /tmp/bench_exp2_wd.log 2>&1
echo "rc=$? $(tail -1 /tmp/bench_exp2_wd.log)"

echo "$(date -u +%H:%M:%S) bench int8+dpm++2m@20 +exp2 (best-config stack)"
LEFTREFILL_FLASH_EXP2=1 BENCH_SAMPLER=dpm++2m BENCH_STEPS=20 BENCH_ITERS=3 \
  python bench.py > /tmp/bench_dpm_exp2_wd.log 2>&1
echo "rc=$? $(tail -1 /tmp/bench_dpm_exp2_wd.log)"

echo "$(date -u +%H:%M:%S) STAGE4 DONE"
