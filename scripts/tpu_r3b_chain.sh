#!/bin/bash
# Round-3 continuation: after the all-on bench (PID in /tmp/bench_allon.pid)
# finishes, run the highest-value pending A/Bs in priority order.  Each run
# is nohup-safe (we ARE the detached process); logs to /tmp/*_r3b.log.
#   nohup bash scripts/tpu_r3b_chain.sh > /tmp/r3b_chain.log 2>&1 &
cd /root/repo

while kill -0 "$(cat /tmp/bench_allon.pid)" 2>/dev/null; do sleep 15; done
echo "$(date -u +%H:%M:%S) all-on bench done: $(tail -1 /tmp/bench_allon.log)"

echo "$(date -u +%H:%M:%S) bench [no_cfgdup]"
LEFTREFILL_CFG_DUP=0 BENCH_ITERS=3 python bench.py > /tmp/bench_nocfgdup_r3b.log 2>&1
echo "rc=$? $(tail -1 /tmp/bench_nocfgdup_r3b.log)"

echo "$(date -u +%H:%M:%S) bench [all_off] (r3-late fusion family off)"
LEFTREFILL_FUSED_RESADD=0 LEFTREFILL_FUSED_FFRES=0 LEFTREFILL_FUSED_LNQ=0 \
LEFTREFILL_SPLIT_CAT=0 LEFTREFILL_CONV_MOMENTS=0 LEFTREFILL_FUSED_RES=0 \
LEFTREFILL_CFG_DUP=0 BENCH_ITERS=3 python bench.py > /tmp/bench_alloff_r3b.log 2>&1
echo "rc=$? $(tail -1 /tmp/bench_alloff_r3b.log)"

echo "$(date -u +%H:%M:%S) train step B=2 (fused-res VJPs on-chip)"
python scripts/tpu_train_step.py > /tmp/train_r3b.log 2>&1
echo "rc=$? $(tail -2 /tmp/train_r3b.log)"

echo "$(date -u +%H:%M:%S) multiview e2e int8 (MV_QUANT=1)"
MV_QUANT=1 python scripts/tpu_multiview_e2e.py > /tmp/mv_e2e_q_r3b.log 2>&1
echo "rc=$? $(tail -2 /tmp/mv_e2e_q_r3b.log)"

echo "$(date -u +%H:%M:%S) bench [dpm20] int8+dpm++2m@20 best-config"
BENCH_SAMPLER=dpm++2m BENCH_STEPS=20 BENCH_ITERS=3 python bench.py > /tmp/bench_dpm_r3b.log 2>&1
echo "rc=$? $(tail -1 /tmp/bench_dpm_r3b.log)"

echo "$(date -u +%H:%M:%S) R3B CHAIN DONE"
