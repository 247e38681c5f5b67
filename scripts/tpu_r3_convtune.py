"""Round-3: int8 conv kernel tuning sweep.

The isolated int8 convs run at ~90-100 TOPS vs the chip's ~394 int8 peak —
the largest non-ceiling headroom left in the UNet step.  Sweep, per hot conv
shape:
  - copy3 block plans (blk_w, blk_ci, blk_co) forced via monkeypatched
    _plan_int8 (the planner's static score may not match silicon), and
  - tap accumulation modes sum9 / dy3 (K=3*blk_ci) / concat (K=9*blk_ci),
  - the single-input kernel plan for comparison,
timing the PRE-quantized kernel call (quantize cost is accounted separately
by tpu_r3_glue_micro.py).  Trials whose block config blows scoped VMEM fail
at compile; they're caught and reported as OOM.

Chained in-graph timing (lax.scan + scalar feedback + jitted drain, bo3).
"""
import sys
sys.exit("OBSOLETE (r5): the int8 tap modes it sweeps (quant.set_int8_tap_mode: dy3/concat) were DELETED in r5 (sum9 is the only strategy; bench_logs_r4 records the negatives). This script is kept as the historical record of how the measurement was made; restore the deleted code from git history to re-run it.")
import sys, time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

print("backend:", jax.devices()[0].platform, flush=True)

from leftrefill_tpu.ops import quant as Q
from leftrefill_tpu.ops.conv import _chan_blocks


def timed(fn, x, *rest, iters=100):
    def body(c, _):
        return fn(c, *rest), None

    loop = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=iters)[0])
    drain = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    float(drain(loop(x)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(drain(loop(x)))
        ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


z = jnp.ones((8, 128), jnp.bfloat16)
floor = timed(lambda c: c + 1.0, z)
print(f"floor: {floor*1e3:.4f} ms", flush=True)

HOT = [
    # (h, w, ci, co, full_sweep?)
    (64, 128, 320, 320, True),   # L0 main convs (x6 enc + x7 dec per step)
    (64, 128, 640, 320, True),   # L0 decoder first-conv after cat
    (64, 128, 960, 320, False),  # L0 decoder 960-cat (pads to 1024)
    (32, 64, 640, 640, False),   # L1
    (16, 32, 1280, 1280, False), # L2
]


def plans_for(h, w, ci, co, full):
    cur = Q._plan_int8(h, w, ci, co)
    out = []
    if full:
        for ci_eff in sorted({ci, -(-ci // 128) * 128}):
            for bw in (32, 64, 128):  # int8 sublane tile is 32: no 16
                if w % bw:
                    continue
                for bci in _chan_blocks(ci_eff):
                    for bco in _chan_blocks(co):
                        # generous VMEM estimate (tap-extra handled per-mode)
                        x_b = 3 * (h + 2) * bw * bci * 2
                        acc_b = h * bw * bco * 4
                        w_b = 9 * bci * bco * 2
                        o_b = h * bw * bco * 2 * 2
                        if x_b + acc_b + w_b + o_b > int(14.5 * 1024 * 1024):
                            continue
                        p = ((bw, bci, bco), ci_eff)
                        if p not in out:
                            out.append(p)
    if cur is not None and cur not in out:
        out.insert(0, cur)
    return out


for (h, w, ci, co, full) in HOT:
    gf = 2 * 9 * 2 * h * w * ci * co / 1e9  # b=2
    print(f"\n# {h}x{w} {ci}->{co}  ({gf:.1f} GFLOP b2)", flush=True)
    xq = jnp.ones((2, h, w, ci), jnp.int8)
    wq = jnp.ones((3, 3, ci, co), jnp.int8)
    ws = jnp.full((co,), 1e-3, jnp.float32)
    bias = jnp.zeros((co,), jnp.float32)
    sx = jnp.float32(1e-2)

    def rebuild(o):
        # feed the bf16 output back as the next int8 input (real dependence
        # so XLA cannot hoist/DCE the kernel; adds one constant cast pass)
        oc = o.shape[-1]
        reps = -(-ci // oc)
        nxt = jnp.concatenate([o] * reps, axis=-1)[..., :ci] if reps > 1 else o[..., :ci]
        return jnp.round(jnp.clip(nxt.astype(jnp.float32) * 0.1, -3, 3)).astype(jnp.int8)

    def pre(c, wq, ws, bias):
        return rebuild(Q.conv3x3_int8_copy3_pre(c, sx, wq, ws, bias))

    orig_plan = Q._plan_int8
    try:
        for plan in plans_for(h, w, ci, co, full):
            (bw, bci, bco), ci_eff = plan
            Q._plan_int8 = lambda *a, _p=plan, **k: _p
            for mode in ("sum9", "dy3", "concat"):
                # concat's im2col tile: rows x 9*bci int8 — skip hopeless ones
                rows = h * bw
                extra = rows * (9 if mode == "concat" else 3) * bci
                if mode != "sum9" and extra > int(9 * 1024 * 1024):
                    continue
                Q.set_int8_tap_mode(mode)
                try:
                    t = timed(pre, xq, wq, ws, bias) - floor
                    print(
                        f"  bw={bw:3d} bci={bci:4d} bco={bco:4d} {mode:6s}: "
                        f"{t*1e3:.4f} ms  {gf/t/1e3:6.1f} TOPS",
                        flush=True,
                    )
                except Exception as e:
                    print(
                        f"  bw={bw:3d} bci={bci:4d} bco={bco:4d} {mode:6s}: "
                        f"FAIL {type(e).__name__}: {str(e)[:80]}",
                        flush=True,
                    )
    finally:
        Q._plan_int8 = orig_plan
        Q.set_int8_tap_mode("sum9")

    sp = Q._plan_int8_single(h, w, ci, co)
    if sp is not None:

        def pre1(c, wq, ws, bias):
            return rebuild(Q.conv3x3_int8_single_pre(c, sx, wq, ws, bias))

        try:
            t = timed(pre1, xq, wq, ws, bias) - floor
            print(f"  single {sp}: {t*1e3:.4f} ms  {gf/t/1e3:6.1f} TOPS", flush=True)
        except Exception as e:
            print(f"  single {sp}: FAIL {str(e)[:80]}", flush=True)

print("\nCONVTUNE DONE", flush=True)
