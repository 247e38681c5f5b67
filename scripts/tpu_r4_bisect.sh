#!/bin/bash
# Round-4 queue: per-flag bisect of the six-gate fusion family (the r3 family
# A/B measured the GROUP at ~-2.5% e2e — cfgdup_only 0.7158 vs all-on 0.6979
# canvases/s — without telling which member(s) cost it).  Each cell is the
# full bench protocol with ONE gate enabled on top of the shipped defaults
# (cfg_dup on, family off).  A cell that beats 0.7158 by >2% is a win —
# flip that single default ON.  Also covers the remaining unmeasured r3
# surfaces: int8 VAE decoder and the dpm++2m@20 re-measure (the r3 pair was
# discarded: two processes contended on the chip).
#
# ONE TPU process at a time — run this alone:
#   nohup bash scripts/tpu_r4_bisect.sh > /tmp/r4_bisect.log 2>&1 &
cd /root/repo

run_bench() {  # name, env assignments...
  local name=$1; shift
  echo "$(date -u +%H:%M:%S) bench [$name]"
  env "$@" BENCH_ITERS=3 python bench.py > "/tmp/bench_${name}_r4.log" 2>&1
  echo "rc=$? $(tail -1 /tmp/bench_${name}_r4.log)"
}

run_bench defaults_ref                                 # re-baseline this epoch

# Deadline guard (added mid-run; bash reads the tail lazily): the driver's
# end-of-round bench.py must run UNCONTENDED, and this chain is detached —
# stop starting new cells once the session budget is near.  01:00:00 UTC
# = unix 1787101200 (~40 min into the session).
DEADLINE=${R4_DEADLINE:-1787101200}
guard() { if [ "$(date +%s)" -ge "$DEADLINE" ]; then echo "$(date -u +%H:%M:%S) deadline reached - stopping queue"; exit 0; fi; }

guard; run_bench dpm20          BENCH_SAMPLER=dpm++2m BENCH_STEPS=20

# Snapshot results into the repo: /tmp dies with the VM, and the driver
# commits uncommitted repo files at round end — so cells that finish after
# the builder's last commit still reach the next round.
mkdir -p /root/repo/bench_logs_r4
snap() { cp /tmp/bench_*_r4.log /tmp/r4_bisect.log /root/repo/bench_logs_r4/ 2>/dev/null; }
snap
guard() { snap; if [ "$(date +%s)" -ge "$DEADLINE" ]; then echo "$(date -u +%H:%M:%S) deadline reached - stopping queue"; snap; exit 0; fi; }

guard; run_bench only_splitcat  LEFTREFILL_SPLIT_CAT=1
guard; run_bench only_fusedres  LEFTREFILL_FUSED_RES=1
guard; run_bench only_moments   LEFTREFILL_CONV_MOMENTS=1
guard; run_bench only_ffres     LEFTREFILL_FUSED_FFRES=1
guard; run_bench only_lnq       LEFTREFILL_FUSED_LNQ=1
guard; run_bench only_resadd    LEFTREFILL_FUSED_RESADD=1

guard; run_bench vae8           BENCH_QUANT_VAE=1
guard; run_bench xla_s8conv     LEFTREFILL_INT8_XLA_CONV=1
guard; run_bench taps_concat    LEFTREFILL_INT8_CONV_TAPS=concat

snap
echo "$(date -u +%H:%M:%S) R4 BISECT DONE"
