"""Offline analysis of the r5 UNet perfetto trace (no TPU needed).

Answers the question the conv-glue roadmap item (CLAUDE.md 1a) was closed
on: is the non-kernel UNet time BUSY device work (many small XLA fusions —
potentially fusable) or IDLE gaps (scheduling — XLA already packed it)?

Usage: python scripts/r5_trace_analyze.py [trace.json.gz]
"""
import gzip
import json
import re
import sys
from collections import defaultdict

path = sys.argv[1] if len(sys.argv) > 1 else sorted(
    __import__("glob").glob("/tmp/r5_jax_trace_unet/**/*perfetto*", recursive=True)
)[-1]
raw = gzip.open(path, "rb").read() if path.endswith(".gz") else open(path, "rb").read()
data = json.loads(raw)
evs = data["traceEvents"] if isinstance(data, dict) else data

# process/thread names from metadata events
pnames, tnames = {}, {}
for e in evs:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pnames[e["pid"]] = e["args"]["name"]
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        tnames[(e["pid"], e["tid"])] = e["args"]["name"]

print("processes:", pnames)
print("threads:", dict(list(tnames.items())[:20]))

# pick device-side tracks: XLA op tracks on the TPU device process
dev_pids = [pid for pid, n in pnames.items() if "TPU" in n.upper() or "device" in n.lower()]
print("device pids:", dev_pids)

slices = defaultdict(list)  # (pid, tid) -> [(ts, dur, name)]
for e in evs:
    if e.get("ph") == "X" and "dur" in e:
        slices[(e["pid"], e.get("tid", 0))].append((e["ts"], e["dur"], e["name"]))

for key, ss in sorted(slices.items(), key=lambda kv: -len(kv[1])):
    pid, tid = key
    pn, tn = pnames.get(pid, "?"), tnames.get(key, "?")
    tot = sum(d for _, d, _ in ss)
    print(f"track pid={pid}({pn}) tid={tid}({tn}): {len(ss)} slices, {tot:.0f} us total")

# choose the per-op device timeline: the "XLA Ops" track if present,
# else the busiest device track
dev_tracks = [k for k in slices if k[0] in dev_pids] or list(slices)
ops_tracks = [k for k in dev_tracks if tnames.get(k) == "XLA Ops"]
dev = ops_tracks[0] if ops_tracks else max(
    dev_tracks, key=lambda k: sum(d for _, d, _ in slices[k])
)
ss = sorted(slices[dev])
pn, tn = pnames.get(dev[0], "?"), tnames.get(dev, "?")
print(f"\n== device track: pid={dev[0]}({pn}) tid={dev[1]}({tn}), {len(ss)} slices ==")

span = ss[-1][0] + ss[-1][1] - ss[0][0]
busy = sum(d for _, d, _ in ss)
print(f"span {span:.0f} us, busy {busy:.0f} us, idle {span-busy:.0f} us "
      f"({(span-busy)/span*100:.1f}%)  [3 forwards]")

# gap list (> 20 us)
gaps = []
end = ss[0][0]
for ts, dur, name in ss:
    if ts > end + 20:
        gaps.append((end, ts - end, name))
    end = max(end, ts + dur)
gaps.sort(key=lambda g: -g[1])
print(f"\ntop gaps (>20us), total gap time {sum(g[1] for g in gaps):.0f} us:")
for at, g, nxt in gaps[:15]:
    print(f"  {g:8.1f} us before {nxt[:90]}")


def category(name: str) -> str:
    n = name.lower()
    if "attn1" in n or "flash" in n:
        return "self-attn pallas"
    if "attn2" in n:
        return "cross-attn"
    if re.search(r"\bconv", n) and "pallas" not in n:
        return "xla conv"
    if "conv" in n:
        return "conv pallas"
    if "ff" in n or "geglu" in n or "mlp" in n:
        return "geglu ff"
    if "dense_int8" in n or "dense" in n:
        return "dense int8"
    if "fusion" in n:
        return "xla fusion"
    if "copy" in n or "bitcast" in n or "transpose" in n or "reshape" in n:
        return "copy/layout"
    if "reduce" in n or "norm" in n or "moment" in n:
        return "norm/reduce"
    if "dot" in n or "einsum" in n or "dot_general" in n:
        return "xla dot"
    return "other"


cats = defaultdict(float)
counts = defaultdict(int)
for _, d, name in ss:
    cats[category(name)] += d
    counts[category(name)] += 1
print("\nbusy time by category (us/fwd over 3 fwds):")
for c, us in sorted(cats.items(), key=lambda kv: -kv[1]):
    print(f"  {us/3:10.1f} us/fwd  {counts[c]:5d} slices  {c}")

# top individual names inside the catch-all categories
print("\ntop 'xla fusion' + 'other' + 'copy/layout' slices (us/fwd):")
agg = defaultdict(float)
cnt = defaultdict(int)
for _, d, name in ss:
    if category(name) in ("xla fusion", "other", "copy/layout", "xla conv", "norm/reduce"):
        agg[name] += d
        cnt[name] += 1
for name, us in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
    print(f"  {us/3:9.1f} us/fwd  x{cnt[name]:<4d} {name[:100]}")
