"""Full-size MultiViewUnetModel on the TPU (VERDICT r1 item 3).

Strategy per CLAUDE.md: params as jit ARGUMENTS (not closure) so the HLO
carries no 865M-param constants, staged escalation:
  1. full-width MultiViewSpatialTransformer alone (ds1: 320ch, joint 2x8192)
  2. full MultiViewUnetModel (865M, bf16), one forward, timed

Reference being matched: /root/reference/ldm/modules/diffusionmodules/
multiview_unet.py:33-411 (the flagship joint-view self-attention at up to
16384 tokens, multiview_attention.py:448).

Run: nohup python scripts/tpu_multiview_fullsize.py [stage] > log 2>&1 &
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

stage = sys.argv[1] if len(sys.argv) > 1 else "all"
print("backend:", jax.devices()[0].platform, flush=True)


def timed_chain(fn, x, *rest, iters=20):
    def body(c, _):
        return fn(c, *rest), None

    loop = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=iters)[0])
    t0 = time.perf_counter()
    o = loop(x)
    s = float(jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))(o))
    print(f"  compile+first: {time.perf_counter()-t0:.1f}s (sum={s:.3f})", flush=True)
    t0 = time.perf_counter()
    o = loop(x)
    float(jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))(o))
    return (time.perf_counter() - t0) / iters


if stage in ("st", "all"):
    print("[stage 1] full-width MultiViewSpatialTransformer (320ch, V=2, 2x4096 joint at ds1 64x64/view... using stitched 64x128 => 8192/view? LeftRefill ds1 = 64x128 per canvas, V canvases)", flush=True)
    from leftrefill_tpu.models.multiview import MultiViewBasicTransformerBlock
    from leftrefill_tpu.models.unet import SpatialTransformer

    st = SpatialTransformer(
        in_channels=320, n_heads=5, d_head=64, depth=1, context_dim=1024,
        use_linear=True, dtype=jnp.bfloat16,
        block_cls=MultiViewBasicTransformerBlock,
        block_kwargs=dict(view_num=2),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 128, 320), jnp.bfloat16)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 77, 1024), jnp.bfloat16)
    t0 = time.perf_counter()
    params = jax.jit(st.init)(jax.random.PRNGKey(2), x, ctx)
    print(f"  init: {time.perf_counter()-t0:.1f}s", flush=True)
    t = timed_chain(lambda c, p, ctx: st.apply(p, c, ctx), x, params, ctx)
    print(f"  stage 1 ok: {t*1e3:.2f} ms/call (joint self-attn 2x8192 tokens)", flush=True)

if stage in ("unet", "all"):
    print("[stage 2] full MultiViewUnetModel 865M bf16, params as jit args", flush=True)
    from leftrefill_tpu.models.multiview import MultiViewUnetModel

    unet = MultiViewUnetModel(view_num=2, dtype=jnp.bfloat16)
    bv = 2  # one scene x 2 views
    x = jax.random.normal(jax.random.PRNGKey(0), (bv, 64, 128, 9), jnp.bfloat16)
    t_ = jnp.array([500] * bv, jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (bv, 77, 1024), jnp.bfloat16)

    t0 = time.perf_counter()
    shapes = jax.eval_shape(unet.init, jax.random.PRNGKey(2), x, t_, ctx)
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype),
        shapes,
    )
    n_params = sum(int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(shapes))
    print(f"  params built (zeros, {n_params/1e6:.0f}M): {time.perf_counter()-t0:.1f}s", flush=True)

    def chain(c, p, t_, ctx):
        o = unet.apply(p, c, t_, ctx).astype(jnp.bfloat16)  # [bv,64,128,4]
        return jnp.concatenate([o, o, c[..., :1]], axis=-1) * 1e-3  # back to 9ch
    t = timed_chain(chain, x, params, t_, ctx, iters=10)
    print(f"  stage 2 ok: {t*1e3:.2f} ms/forward (MULTIVIEW FULL SIZE)", flush=True)

print("DONE", flush=True)
