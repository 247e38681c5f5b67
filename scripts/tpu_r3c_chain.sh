#!/bin/bash
# Round-3 continuation chain 2: train-step regression fix check, then the
# decisive missing A/B cell (cfg_dup ON + rest of the r3-late family OFF),
# then the best-config dpm++2m@20 variant.
#   nohup bash scripts/tpu_r3c_chain.sh > /tmp/r3c_chain.log 2>&1 &
cd /root/repo

echo "$(date -u +%H:%M:%S) train step B=2 (flash fwd blk128 on the VJP path)"
python scripts/tpu_train_step.py > /tmp/train_r3c.log 2>&1
echo "rc=$? $(tail -2 /tmp/train_r3c.log | head -1)"

echo "$(date -u +%H:%M:%S) bench [cfgdup_only] (family off, cfg_dup on)"
LEFTREFILL_FUSED_RESADD=0 LEFTREFILL_FUSED_FFRES=0 LEFTREFILL_FUSED_LNQ=0 \
LEFTREFILL_SPLIT_CAT=0 LEFTREFILL_CONV_MOMENTS=0 LEFTREFILL_FUSED_RES=0 \
BENCH_ITERS=3 python bench.py > /tmp/bench_cfgduponly_r3c.log 2>&1
echo "rc=$? $(tail -1 /tmp/bench_cfgduponly_r3c.log)"

echo "$(date -u +%H:%M:%S) bench [dpm20] int8+dpm++2m@20 best-config"
BENCH_SAMPLER=dpm++2m BENCH_STEPS=20 BENCH_ITERS=3 python bench.py > /tmp/bench_dpm_r3c.log 2>&1
echo "rc=$? $(tail -1 /tmp/bench_dpm_r3c.log)"

echo "$(date -u +%H:%M:%S) multiview e2e int8 (MV_QUANT=1)"
MV_QUANT=1 python scripts/tpu_multiview_e2e.py > /tmp/mv_e2e_q_r3c.log 2>&1
echo "rc=$? $(tail -2 /tmp/mv_e2e_q_r3c.log)"

echo "$(date -u +%H:%M:%S) R3C CHAIN DONE"
