#!/bin/bash
# Post-recovery stage 3: per-flag e2e bench A/B of every r3-late default-ON
# fusion (all unmeasured on-chip at commit time due to the relay outage).
# Each run is the full bench.py protocol (int8 DDIM-50 INNER=3) with ONE
# family member disabled; compare against the all-on default from stage 1
# (/tmp/bench_wd.log).  A flag whose OFF run is faster is a regression —
# flip its default in code.
#   nohup bash scripts/tpu_r3_stage3.sh > /tmp/stage3.log 2>&1 &
cd /root/repo

run_bench() {  # name, env assignments...
  local name=$1; shift
  echo "$(date -u +%H:%M:%S) bench [$name]"
  env "$@" BENCH_ITERS=3 python bench.py > "/tmp/bench_${name}_wd.log" 2>&1
  echo "rc=$? $(tail -1 /tmp/bench_${name}_wd.log)"
}

echo "$(date -u +%H:%M:%S) flash exp2 A/B (kernel-level chained timing)"
python scripts/tpu_r3_exp2_ab.py > /tmp/exp2_ab_wd.log 2>&1
echo "rc=$? $(tail -3 /tmp/exp2_ab_wd.log | head -2)"

run_bench allon_ref                      # re-baseline in this process epoch
run_bench no_resadd   LEFTREFILL_FUSED_RESADD=0
run_bench no_ffres    LEFTREFILL_FUSED_FFRES=0
run_bench no_lnq      LEFTREFILL_FUSED_LNQ=0
run_bench no_splitcat LEFTREFILL_SPLIT_CAT=0
run_bench no_moments  LEFTREFILL_CONV_MOMENTS=0
run_bench no_fusedres LEFTREFILL_FUSED_RES=0
run_bench no_cfgdup   LEFTREFILL_CFG_DUP=0
run_bench all_off     LEFTREFILL_FUSED_RESADD=0 LEFTREFILL_FUSED_FFRES=0 \
                      LEFTREFILL_FUSED_LNQ=0 LEFTREFILL_SPLIT_CAT=0 \
                      LEFTREFILL_CONV_MOMENTS=0 LEFTREFILL_FUSED_RES=0 \
                      LEFTREFILL_CFG_DUP=0

echo "$(date -u +%H:%M:%S) STAGE3 DONE"
