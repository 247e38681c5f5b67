#!/bin/bash
# Poll the axon TPU relay until it answers, then run the pending round-3
# measurement suite unattended (CLAUDE.md roadmap 3b).
#
# Launch detached:  nohup bash scripts/relay_watchdog.sh > /tmp/watchdog.log 2>&1 &
#
# Probe design: each probe is a fresh python that jits a tiny reduction.  A
# healthy relay answers in seconds; a dead one either raises (backend
# connection dropped -> process exits nonzero) or hangs (we abandon it after
# 10 min — it never reached TPU execution, so killing it cannot wedge the
# relay the way killing a mid-flight TPU program does).
cd /root/repo

probe() {
  rm -f /tmp/wd_probe.log
  nohup python -c '
import jax, jax.numpy as jnp
x = jax.jit(lambda a: jnp.sum(a*a))(jnp.ones((128,128), jnp.bfloat16))
print("PROBE_OK", float(x), flush=True)
' > /tmp/wd_probe.log 2>&1 &
  local pid=$!
  for _ in $(seq 1 60); do
    sleep 10
    kill -0 "$pid" 2>/dev/null || break
  done
  if kill -0 "$pid" 2>/dev/null; then
    kill "$pid" 2>/dev/null; sleep 2; kill -9 "$pid" 2>/dev/null
  fi
  grep -q PROBE_OK /tmp/wd_probe.log
}

until probe; do
  echo "$(date -u +%H:%M:%S) relay still down"
  sleep 120
done
echo "$(date -u +%H:%M:%S) RELAY UP — running pending suite"

run() {
  echo "$(date -u +%H:%M:%S) start $1"
  python "scripts/$1.py" > "/tmp/$1_wd.log" 2>&1
  echo "$(date -u +%H:%M:%S) done $1 rc=$?"
}

run tpu_r3_newquant_ab
run tpu_r3_resadd_ab
run tpu_r3_split4
run tpu_r3_pipeline_ab
echo "$(date -u +%H:%M:%S) bench (int8 default, INNER=3)"
python bench.py > /tmp/bench_wd.log 2>&1
echo "$(date -u +%H:%M:%S) bench rc=$?"
echo "$(date -u +%H:%M:%S) ALL DONE"
