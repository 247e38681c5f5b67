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
device_events = False
for p in files:
    if p.endswith(".xplane.pb"):
        raw = open(p, "rb").read()
        has_tpu = b"/device:TPU" in raw or b"TPU" in raw
        device_events = device_events or has_tpu
        print(f"xplane {os.path.basename(p)}: {len(raw)} bytes, "
              f"TPU plane marker: {has_tpu}", flush=True)

# --- phase 2: if the relay produced ANY trace artifacts, trace the full
# int8 865M UNet forward (CFG batch-2, the bench step) with a perfetto
# trace and print the top device slices — the breakdown the conv-glue
# question (CLAUDE.md roadmap 1a) has waited on since r3.
if files:
    import gzip
    import json

    from bench import build_full_bundle

    UNET_DIR = "/tmp/r5_jax_trace_unet"
    os.makedirs(UNET_DIR, exist_ok=True)
    try:
        model, params = build_full_bundle(quant=True)
        unet = model.unet
        fwd = jax.jit(
            lambda p, x, t, c: unet.apply({"params": p}, x, t, c)
        )
        xb = jnp.zeros((2, 64, 128, 9), jnp.float32)
        tb = jnp.full((2,), 500, jnp.int32)
        cb = jnp.zeros((2, 77, 1024), jnp.float32)
        up = params["unet"]
        jax.block_until_ready(fwd(up, xb, tb, cb))  # compile outside trace
        float(jnp.sum(fwd(up, xb, tb, cb)))         # drain
        with jax.profiler.trace(UNET_DIR, create_perfetto_trace=True):
            for _ in range(3):
                float(jnp.sum(fwd(up, xb, tb, cb)))
        print("unet trace context exited cleanly", flush=True)
        pfts = sorted(glob.glob(UNET_DIR + "/**/*perfetto*", recursive=True))
        ufiles = sorted(glob.glob(UNET_DIR + "/**/*", recursive=True))
        print(f"{len(ufiles)} unet artifact paths; perfetto: {pfts}", flush=True)
        for pf in pfts[:1]:
            raw = gzip.open(pf, "rb").read() if pf.endswith(".gz") else open(pf, "rb").read()
            data = json.loads(raw)
            evs = data["traceEvents"] if isinstance(data, dict) else data
            tot = {}
            for e in evs:
                if e.get("ph") == "X" and "dur" in e:
                    tot[e["name"]] = tot.get(e["name"], 0.0) + e["dur"]
            top = sorted(tot.items(), key=lambda kv: -kv[1])[:40]
            print("top slices by total us over 3 forwards:", flush=True)
            for name, us in top:
                print(f"  {us/3:10.1f} us/fwd  {name[:110]}", flush=True)
    except Exception:
        print("UNET TRACE RAISED:", flush=True)
        traceback.print_exc()

print("PROFILER PROBE DONE", flush=True)
