"""Round-3: inspect the OPTIMIZED HLO of one L0 int8 ResBlock to see what XLA
actually schedules between the conv kernels (fusion boundaries, copies,
materialized intermediates) — profiler is blocked by the relay, but the
compiled module text is not."""
import re, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

print("backend:", jax.devices()[0].platform, flush=True)

from leftrefill_tpu.models.unet import ResBlock
from leftrefill_tpu.ops.quant import quantize_params_like

B, H, W, C = 2, 64, 128, 320
x = jnp.zeros((B, H, W, C), jnp.bfloat16)
emb = jnp.zeros((B, 1280), jnp.bfloat16)
rb = ResBlock(out_channels=C, dtype=jnp.bfloat16, quant=True)
struct = jax.eval_shape(rb.init, jax.random.PRNGKey(0), x, emb)["params"]
fp = jax.tree_util.tree_map(
    lambda s: (jnp.ones(s.shape, jnp.float32) * 0.002).astype(s.dtype),
    jax.eval_shape(ResBlock(out_channels=C, dtype=jnp.bfloat16).init, jax.random.PRNGKey(0), x, emb)["params"],
)
qp = quantize_params_like(struct, fp)

fn = jax.jit(lambda p, a, e: rb.apply({"params": p}, a, e))
compiled = fn.lower(qp, x, emb).compile()
txt = compiled.as_text()
print(f"HLO text: {len(txt)} chars", flush=True)

# entry computation op sequence (skip nested fusions' bodies)
lines = txt.splitlines()
in_entry = False
ops = []
for ln in lines:
    if re.match(r"ENTRY ", ln):
        in_entry = True
        continue
    if in_entry:
        if ln.startswith("}"):
            break
        m = re.match(r"\s+%?\S+ = (\S+?)[\s(]", ln)
        if not m:
            continue
        shape_op = m.group(1)
        kind = ln.split("=", 1)[1].strip()
        opname = re.match(r"\S+\s+(\w+)", kind)
        op = opname.group(1) if opname else "?"
        tag = ""
        if "custom_call_target=\"tpu_custom_call\"" in ln:
            nm = re.search(r'op_name="([^"]*)"', ln)
            tag = " PALLAS " + (nm.group(1).split("/")[-2] if nm else "")
        ops.append((op, shape_op, tag))

from collections import Counter
print("entry op histogram:", Counter(o for o, _, _ in ops), flush=True)
print("--- entry sequence ---", flush=True)
for op, shp, tag in ops:
    print(f"  {op:12s} {shp[:60]}{tag}", flush=True)

# big buffers: every materialized tensor over 2MB in the entry
print("--- fusions detail (kind + output shape) ---", flush=True)
for ln in lines:
    m = re.match(r"\s+%?(fusion[\w.]*) = (\S+) fusion", ln)
    if m and "ENTRY" not in ln:
        pass
# memory stats
try:
    mem = compiled.memory_analysis()
    print(f"temp allocation: {mem.temp_size_in_bytes/1e6:.1f} MB, "
          f"argument: {mem.argument_size_in_bytes/1e6:.1f} MB", flush=True)
except Exception as e:
    print("memory_analysis unavailable:", e, flush=True)
print("HLO INSPECT DONE", flush=True)
