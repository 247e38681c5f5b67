"""Probe for roadmap 1a: int8 conv reading ONE padded input (in-VMEM sublane
relayout per tap) vs the shipped 3-copy kernel.  If the relayout cost is
below the saved HBM traffic (~3x input reads + 3x writes), round 3 should
switch the int8 path to single-input."""
import functools, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.devices()[0].platform, flush=True)

B, H, W, CI, CO = 2, 64, 128, 384, 384
BCI, BCO = 128, 128


def kernel_single(xp_ref, w_ref, o_ref, acc_ref):
    ci = pl.program_id(2)

    @pl.when(ci == 0)
    def _z():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for dy in range(3):
        for dx in range(3):
            xs = xp_ref[0, dy : dy + H, dx : dx + W].reshape(H * W, BCI)
            acc_ref[...] += jax.lax.dot_general(
                xs, w_ref[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

    @pl.when(ci == pl.num_programs(2) - 1)
    def _w():
        o_ref[0] = acc_ref[...].reshape(H, W, BCO).astype(o_ref.dtype)


@jax.jit
def conv_single(x, w):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return pl.pallas_call(
        kernel_single,
        out_shape=jax.ShapeDtypeStruct((B, H, W, CO), jnp.bfloat16),
        grid=(B, CO // BCO, CI // BCI),
        in_specs=[
            pl.BlockSpec((1, H + 2, W + 2, BCI), lambda b, co, ci: (b, 0, 0, ci), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, BCI, BCO), lambda b, co, ci: (0, 0, ci, co), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, BCO), lambda b, co, ci: (b, 0, 0, co), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((H * W, BCO), jnp.int32)],
    )(xp, w)


def timed_chain(fn, x, *rest, iters=200):
    def body(c, _):
        o = fn(c, *rest)
        return jnp.clip(o.astype(jnp.int32) >> 4, -127, 127).astype(jnp.int8), None
    loop = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=iters)[0])
    drain = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    float(drain(loop(x)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(drain(loop(x))); ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


x = jax.random.randint(jax.random.PRNGKey(0), (B, H, W, CI), -127, 127, jnp.int8)
w = jax.random.randint(jax.random.PRNGKey(1), (3, 3, CI, CO), -127, 127, jnp.int8)

# correctness vs int32 XLA conv
ref = jax.lax.conv_general_dilated(
    x.astype(jnp.float32), w.astype(jnp.float32), (1, 1), ((1, 1), (1, 1)),
    dimension_numbers=("NHWC", "HWIO", "NHWC"),
)
out = np.asarray(conv_single(x, w), np.float32)
err = np.abs(out - np.asarray(ref)).max() / np.abs(np.asarray(ref)).max()
print(f"single-input int8 conv relerr vs fp ref: {err:.5f}", flush=True)

fl = 2 * 9 * B * H * W * CI * CO
t1 = timed_chain(conv_single, x, w)
print(f"single-input: {t1*1e3:.3f} ms ({fl/t1/1e12:.0f} TOPS)", flush=True)

# shipped 3-copy int8 kernel at the same shape for comparison
from leftrefill_tpu.ops.quant import conv3x3_int8
ws = jnp.ones((CO,), jnp.float32)
bias = jnp.zeros((CO,), jnp.bfloat16)
def three_copy(c, w):
    return conv3x3_int8(c.astype(jnp.bfloat16), w, ws, bias)
t2 = timed_chain(three_copy, x, w, iters=100)
print(f"3-copy (incl act-quant): {t2*1e3:.3f} ms ({fl/t2/1e12:.0f} TOPS)", flush=True)
print("PROBE DONE", flush=True)
