"""One train step on the FULL 865M MultiViewUnetModel at V=4 (joint
self-attention N = 4*8192 = 32768) on one chip — the load test for the
streaming-K/V flash forward + chunked-dq backward inside the rematted train
graph (the resident plan fails AOT at this shape; the r4 lesson is that
remat graphs are tighter on scoped vmem than inference graphs, so the
inference-measured streaming plan needs its own proof here).

Reference being matched: multiview training (/root/reference/
train_multiview_inpainting.py) with up to 4 views (multiview_attention.py:448).

Run: nohup python scripts/tpu_r5_mv4_train_step.py > log 2>&1 &
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import optax

print("backend:", jax.devices()[0].platform, flush=True)

from leftrefill_tpu.models.multiview import MultiViewUnetModel
from leftrefill_tpu.train.trainer import OptimizerConfig, make_optimizer, trainable_mask

V = 4
unet = MultiViewUnetModel(view_num=V, dtype=jnp.bfloat16, remat=True)
B = V  # one scene x 4 views
x = jax.random.normal(jax.random.PRNGKey(0), (B, 64, 128, 9), jnp.bfloat16)
t = jnp.array([500] * B, jnp.int32)
ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 77, 1024), jnp.bfloat16)
target = jax.random.normal(jax.random.PRNGKey(2), (B, 64, 128, 4), jnp.bfloat16)

t0 = time.perf_counter()
shapes = jax.eval_shape(unet.init, jax.random.PRNGKey(3), x, t, ctx)
params = jax.tree_util.tree_map(
    lambda s: (jnp.ones(s.shape, s.dtype) * 0.01).astype(jnp.float32), shapes
)["params"]
n = sum(int(np.prod(np.shape(p))) for p in jax.tree_util.tree_leaves(params))
print(f"params: {n/1e6:.0f}M fp32, built in {time.perf_counter()-t0:.1f}s", flush=True)

mask = trainable_mask({"unet": params}, lambda keys: "to_k" in keys or "to_v" in keys)
tx = make_optimizer(OptimizerConfig(lr=1e-4, weight_decay=0.0), mask)
opt_state = tx.init({"unet": params})


def loss_fn(p, xc, tc, cc, tg):
    out = unet.apply({"params": p["unet"]}, xc, tc, cc)
    return jnp.mean((out.astype(jnp.float32) - tg.astype(jnp.float32)) ** 2)


@jax.jit
def step(p, opt_state, xc, tc, cc, tg):
    loss, grads = jax.value_and_grad(loss_fn)(p, xc, tc, cc, tg)
    updates, opt_state = tx.update(grads, opt_state, p)
    return optax.apply_updates(p, updates), opt_state, loss


t0 = time.perf_counter()
p = {"unet": params}
p, opt_state, loss = step(p, opt_state, x, t, ctx, target)
print(f"compile+step1: {time.perf_counter()-t0:.1f}s loss={float(loss):.5f}", flush=True)
assert np.isfinite(float(loss))
ts = []
for i in range(3):
    t0 = time.perf_counter()
    p, opt_state, loss = step(p, opt_state, x, t, ctx, target)
    jax.block_until_ready(loss)
    ts.append(time.perf_counter() - t0)
print(f"V=4 train step (1 scene): {min(ts)*1e3:.1f} ms  loss={float(loss):.5f}", flush=True)
print("MV4 TRAIN STEP DONE", flush=True)
