"""Round-3: time the single-input vs 3-copy int8 conv kernels at EVERY conv
shape in the 865M UNet (CFG batch 2), to drive the per-shape dispatch in
ops/quant.conv3x3_int8.  Chained-scan timing per CLAUDE.md (output feeds the
next input so XLA cannot hoist the op)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

from leftrefill_tpu.ops.quant import (
    conv3x3_int8_copy3,
    conv3x3_int8_single,
    quantize_weight,
    _plan_int8,
    _plan_int8_single,
)

print("backend:", jax.devices()[0].platform, flush=True)

# (h, w, ci, co, count) — count = occurrences per UNet forward (down+up+middle)
SHAPES = [
    (64, 128, 320, 320, 7),
    (64, 128, 640, 320, 3),
    (64, 128, 960, 320, 1),
    (32, 64, 640, 640, 5),
    (32, 64, 960, 640, 2),
    (32, 64, 1280, 640, 1),
    (16, 32, 1280, 1280, 9),
    (16, 32, 1920, 1280, 2),
    (16, 32, 2560, 1280, 2),
    (8, 16, 1280, 1280, 7),
    (8, 16, 2560, 1280, 1),
]
B = 2


def timed_chain(fn, x, iters=200):
    ci = x.shape[-1]

    def body(c, _):
        o = fn(c)  # bf16 (b,h,w,co)
        # rebuild an int8-magnitude input of the right channel count
        oc = o.shape[-1]
        reps = -(-ci // oc)
        nxt = jnp.concatenate([o] * reps, axis=-1)[..., :ci] if reps > 1 else o[..., :ci]
        nxt = jnp.clip(nxt * 0.1, -3, 3).astype(jnp.bfloat16)
        return nxt, None

    loop = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=iters)[0])
    drain = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    float(drain(loop(x)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(drain(loop(x)))
        ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


tot_single, tot_copy3 = 0.0, 0.0
for h, w, ci, co, count in SHAPES:
    k = jax.random.PRNGKey(0)
    x = (jax.random.normal(k, (B, h, w, ci), jnp.float32)).astype(jnp.bfloat16)
    wt = jax.random.normal(jax.random.PRNGKey(1), (3, 3, ci, co), jnp.float32) * 0.05
    bias = jnp.zeros((co,), jnp.float32)
    wq, ws = quantize_weight(wt)
    fl = 2 * 9 * B * h * w * ci * co

    res = {}
    for name, fn, plan in (
        ("single", conv3x3_int8_single, _plan_int8_single(h, w, ci, co)),
        ("copy3", conv3x3_int8_copy3, _plan_int8(h, w, ci, co)),
    ):
        if plan is None:
            print(f"{h}x{w} {ci}->{co}: {name} NO PLAN", flush=True)
            continue
        t = timed_chain(lambda c, fn=fn: fn(c, wq, ws, bias), x)
        res[name] = t
        print(
            f"{h}x{w} {ci}->{co} x{count}: {name} {t*1e3:.3f} ms ({fl/t/1e12:.0f} TOPS)"
            f"  plan={plan}",
            flush=True,
        )
    if "single" in res:
        tot_single += res["single"] * count
    if "copy3" in res:
        tot_copy3 += res["copy3"] * count
    if "single" in res and "copy3" in res:
        print(f"  -> single/copy3 = {res['single']/res['copy3']:.3f}", flush=True)

print(f"TOTAL per-UNet-fwd conv time: single {tot_single*1e3:.2f} ms, "
      f"copy3 {tot_copy3*1e3:.2f} ms", flush=True)
print("PROBE DONE", flush=True)
