"""One real prompt-tuning train step on the FULL 865M UNet at the 64x128
stitched latent (ds1 self-attention N=8192) on one TPU chip — the
memory-bounded-training proof for the Pallas flash backward (VERDICT r1 #7;
xformers-equivalent path: /root/reference/ldm/modules/attention.py:236).

Uses remat on the UNet blocks + the blockwise flash VJP; the old XLA-recompute
VJP materialized [B,H,8192,8192] fp32 per attention site and could not fit.

Run: nohup python scripts/tpu_train_step.py > log 2>&1 &
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import optax

print("backend:", jax.devices()[0].platform, flush=True)

from leftrefill_tpu.models.unet import UNetModel
from leftrefill_tpu.train.trainer import OptimizerConfig, make_optimizer, trainable_mask

# full SD2-inpainting UNet, remat on, bf16 compute
unet = UNetModel(dtype=jnp.bfloat16, remat=True)
B = 8  # the reference per-GPU training batch (fp16); bf16 here
x = jax.random.normal(jax.random.PRNGKey(0), (B, 64, 128, 9), jnp.bfloat16)
t = jnp.array([500] * B, jnp.int32)
ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 77, 1024), jnp.bfloat16)
target = jax.random.normal(jax.random.PRNGKey(2), (B, 64, 128, 4), jnp.bfloat16)

t0 = time.perf_counter()
shapes = jax.eval_shape(unet.init, jax.random.PRNGKey(3), x, t, ctx)
# params in fp32 (training dtype policy), context trains via a proxy: train
# the cross-attn K/V projections of one block to give the attention bwd real
# consumers plus the full backward through all blocks.
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
ts = []
for i in range(3):
    t0 = time.perf_counter()
    p, opt_state, loss = step(p, opt_state, x, t, ctx, target)
    l = float(loss)
    ts.append(time.perf_counter() - t0)
print(f"train step (B={B}, 865M remat, flash bwd at N=8192): {min(ts)*1e3:.0f} ms, loss finite={np.isfinite(l)}", flush=True)
print("TRAINSTEP DONE", flush=True)
