"""Round-3: does XLA hoist the scan-invariant cross-attention K/V projections
(to_k/to_v of the fixed text context) out of the sampling while-loop?  If
yes, a hand-built conditioning KV cache would be a no-op.  Inspects the
optimized HLO of a 5-step scan over a small SpatialTransformer apply."""
import re, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

print("backend:", jax.devices()[0].platform, flush=True)

from leftrefill_tpu.models.unet import SpatialTransformer
from leftrefill_tpu.ops.quant import quantize_params_like

st = SpatialTransformer(
    in_channels=320, n_heads=5, d_head=64, depth=1, context_dim=1024,
    dtype=jnp.bfloat16, quant=True,
)
x = jnp.zeros((2, 16, 32, 320), jnp.bfloat16)
ctx = jnp.zeros((2, 77, 1024), jnp.bfloat16)
struct = jax.eval_shape(st.init, jax.random.PRNGKey(0), x, ctx)["params"]
fp = jax.tree_util.tree_map(
    lambda s: (jnp.ones(s.shape, jnp.float32) * 0.002).astype(s.dtype), struct
)
qp = quantize_params_like(struct, fp)


def run(p, x0, ctx):
    def body(c, _):
        return st.apply({"params": p}, c, ctx) * 0.999, None
    out, _ = jax.lax.scan(body, x0, None, length=5)
    return out


txt = jax.jit(run).lower(qp, x, ctx).compile().as_text()
print(f"HLO: {len(txt)} chars", flush=True)

# find the while body computation(s) and count dot/custom-call with a
# [77 or 154, ...] operand (the ctx-projection GEMMs)
in_body = None
body_dots = entry_dots = 0
for ln in txt.splitlines():
    m = re.match(r"(%?\S+) \(", ln)
    if re.match(r"\s*ENTRY", ln):
        in_body = "entry"
        continue
    if re.match(r"%?\S*(body|Body)\S* \(", ln):
        in_body = "body"
        continue
    if re.match(r"\S+ \(", ln):  # other computation
        in_body = "other"
        continue
    if ("dot(" in ln or "custom-call" in ln or " dot " in ln) and ("154," in ln or "77," in ln):
        if in_body == "body":
            body_dots += 1
            print("BODY :", ln.strip()[:140], flush=True)
        else:
            entry_dots += 1
            print(f"{in_body or '?':5s}:", ln.strip()[:140], flush=True)
print(f"ctx-GEMM-ish ops in while body: {body_dots}, elsewhere: {entry_dots}", flush=True)
print("LICM CHECK DONE", flush=True)
