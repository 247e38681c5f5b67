#!/bin/bash
# Post-recovery stage 2 (run after relay_watchdog.sh finishes its suite):
# the follow-up measurements that depend on stage-1 results being sane.
#   nohup bash scripts/tpu_r3_stage2.sh > /tmp/stage2.log 2>&1 &
cd /root/repo

echo "$(date -u +%H:%M:%S) bench int8 batch-4 (does batching help post-fusions?)"
BENCH_BATCH=4 BENCH_ITERS=3 python bench.py > /tmp/bench_b4_wd.log 2>&1
echo "rc=$? $(tail -1 /tmp/bench_b4_wd.log)"

echo "$(date -u +%H:%M:%S) bench int8 dpm++2m@20 (fast-sampler variant)"
BENCH_SAMPLER=dpm++2m BENCH_STEPS=20 python bench.py > /tmp/bench_dpm_wd.log 2>&1
echo "rc=$? $(tail -1 /tmp/bench_dpm_wd.log)"

echo "$(date -u +%H:%M:%S) multiview e2e (bf16; FF-res fusion regression)"
python scripts/tpu_multiview_e2e.py > /tmp/mv_e2e_wd.log 2>&1
echo "rc=$? $(tail -2 /tmp/mv_e2e_wd.log)"

echo "$(date -u +%H:%M:%S) multiview e2e int8 (MV_QUANT=1, full fusion family)"
MV_QUANT=1 python scripts/tpu_multiview_e2e.py > /tmp/mv_e2e_q_wd.log 2>&1
echo "rc=$? $(tail -2 /tmp/mv_e2e_q_wd.log)"

echo "$(date -u +%H:%M:%S) train step B=2 (geglu_fused_res VJP on-chip check)"
python scripts/tpu_train_step.py > /tmp/train_wd.log 2>&1
echo "rc=$? $(tail -2 /tmp/train_wd.log)"

echo "$(date -u +%H:%M:%S) split-cat A/B (unmaterialized decoder skip cats)"
python scripts/tpu_r3_splitcat_ab.py > /tmp/splitcat_wd.log 2>&1
echo "rc=$? $(tail -3 /tmp/splitcat_wd.log)"

echo "$(date -u +%H:%M:%S) glue micro (bottom-up non-attn accounting)"
python scripts/tpu_r3_glue_micro.py > /tmp/glue_wd.log 2>&1
echo "rc=$? $(tail -2 /tmp/glue_wd.log)"

echo "$(date -u +%H:%M:%S) conv tune sweep (block plans + tap modes)"
python scripts/tpu_r3_convtune.py > /tmp/convtune_wd.log 2>&1
echo "rc=$? $(tail -2 /tmp/convtune_wd.log)"

echo "$(date -u +%H:%M:%S) STAGE2 DONE"
