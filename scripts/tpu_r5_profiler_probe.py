"""Round-5 VERDICT #8: one concrete jax.profiler attempt through the axon relay.

Roadmap item 5 has said "trace-viewer profiling once the relay supports
jax.profiler" since r2 without a recorded failure mode.  This probe pins it
down: start a device trace around a trivial jitted op and report exactly
what the relay produces — a viewable trace directory, an error, or a trace
with host-only (no TPU) events.

Run detached (ONE TPU process):
  nohup python scripts/tpu_r5_profiler_probe.py > bench_logs_r5/profiler_probe_r5.log 2>&1 &
"""
import glob
import os
import sys
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

print("backend:", jax.devices()[0].platform, flush=True)

TRACE_DIR = "/tmp/r5_jax_trace"
os.makedirs(TRACE_DIR, exist_ok=True)

f = jax.jit(lambda x: jnp.sum(x @ x))
x = jnp.ones((512, 512), jnp.bfloat16)
print("warmup:", float(f(x)), flush=True)

try:
    with jax.profiler.trace(TRACE_DIR, create_perfetto_trace=False):
        for _ in range(5):
            float(f(x))
    print("trace context exited cleanly", flush=True)
except Exception:
    print("TRACE RAISED:", flush=True)
    traceback.print_exc()

files = sorted(glob.glob(TRACE_DIR + "/**/*", recursive=True))
print(f"{len(files)} artifact paths under {TRACE_DIR}:", flush=True)
for p in files[:40]:
    print("  ", p, os.path.getsize(p) if os.path.isfile(p) else "<dir>", flush=True)

# does the trace contain DEVICE (TPU) events or host-only?  The .xplane.pb
# carries plane names; grep the raw bytes for the device plane marker.
for p in files:
    if p.endswith(".xplane.pb"):
        raw = open(p, "rb").read()
        has_tpu = b"/device:TPU" in raw or b"TPU" in raw
        print(f"xplane {os.path.basename(p)}: {len(raw)} bytes, "
              f"TPU plane marker: {has_tpu}", flush=True)

print("PROFILER PROBE DONE", flush=True)
