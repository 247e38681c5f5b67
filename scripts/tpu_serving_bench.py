"""Batched-serving benchmark (BASELINE config 5): gradio-path pipeline at
batch 8 with LoRA adapter swaps driven through runtime.LoraAdapterStore.

Measures canvases/sec for:
  - batch-8, no adapter (steady state)
  - batch-8, alternating 2 adapters (LRU cache hits — swap is ~free)
  - batch-8, rotating 3 adapters with keep=2 (every request pays a merge)

Env: BENCH_QUANT=1 (int8 UNet), BENCH_STEPS (default 50), BENCH_RANK.
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

print("backend:", jax.devices()[0].platform, flush=True)

import bench
from leftrefill_tpu.models.clip import build_prompt_tokenizer
from leftrefill_tpu.models.lora import init_lora
from leftrefill_tpu.pipeline import RefInpaintPipeline, stitch_canvas
from leftrefill_tpu.runtime import LoraAdapterStore

BATCH = int(os.environ.get("BENCH_BATCH", "8"))
STEPS = int(os.environ.get("BENCH_STEPS", "50"))
RANK = int(os.environ.get("BENCH_RANK", "16"))
QUANT = os.environ.get("BENCH_QUANT", "0") == "1"

model, params = bench.build_full_bundle(quant=QUANT)
import warnings

with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    tok, sp, _ = build_prompt_tokenizer(["repeat_50_<special-token>"], ["init"])
pipe = RefInpaintPipeline(
    model=model, params=params, tokenizer=tok, special_tokens=sp,
    ddim_steps=STEPS, guidance_scale=2.5, eta=1.0,
)

# adapters over the (possibly int8) base: LoRA targets the attention dense
# kernels.  int8 kernels can't take additive merges, so the int8 store keeps
# the fp MASTER UNet tree and requantizes after each merge
# (runtime.LoraAdapterStore(master_unet=...), round-5 VERDICT #6) — the swap
# costs one jitted merge+requant pass instead of being impossible.
master_unet = None
if QUANT:
    # the fp master = the same deterministic init bench quantized from
    k = jax.random.PRNGKey(0)
    master_unet = jax.jit(model.unet.init)(
        k, jnp.zeros((1, 64, 128, 9)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 1024)),
    )["params"]
    print("int8 base + fp master: adapter swaps merge->requantize", flush=True)

store = LoraAdapterStore(params, keep=2, master_unet=master_unet)
lora_base = master_unet if master_unet is not None else params["unet"]
for i, name in enumerate(("style_a", "style_b", "style_c")):
    lora = init_lora(lora_base, rank=RANK, key=jax.random.PRNGKey(10 + i))
    # non-zero up factors so every merge does real work
    lora = {
        k: {"down": v["down"], "up": jax.random.normal(jax.random.PRNGKey(i), v["up"].shape, jnp.float32) * 0.01}
        for k, v in lora.items()
    }
    store.add(name, lora)
print(f"adapters: {store.names()}, rank {RANK}", flush=True)

rng = np.random.RandomState(0)
ref = rng.uniform(-1, 1, (BATCH, 512, 512, 3)).astype(np.float32)
src = rng.uniform(-1, 1, (BATCH, 512, 512, 3)).astype(np.float32)
image, mask = stitch_canvas(ref, src, np.ones((BATCH, 512, 512, 1), np.float32))

drain = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def run_request(adapter, seed):
    p = store.params_for(adapter)
    out = pipe._generate(
        p,
        jnp.asarray(image, jnp.float32),
        jnp.asarray(mask, jnp.float32),
        jnp.asarray(pipe.prompt_tokens(BATCH)),
        jnp.asarray(pipe.uncond_tokens(BATCH)),
        jax.random.PRNGKey(seed),
        None,
    )
    return out


# compile + warm
np.asarray(drain(run_request(None, 0)))
np.asarray(drain(run_request("style_a", 1)))
np.asarray(drain(run_request("style_b", 2)))

# cold swap latency alone (merge [+ requant for int8]), post-compile
store._merged.clear()
t0 = time.time()
p_swap = store.params_for("style_c")
np.asarray(drain(jax.tree_util.tree_leaves(p_swap["unet"])[0]))
print(f"cold adapter swap (merge{'+requant' if QUANT else ''}): "
      f"{time.time() - t0:.3f} s", flush=True)

def scenario(label, seq, iters=2):
    ts = []
    for it in range(iters):
        t0 = time.time()
        for j, ad in enumerate(seq):
            np.asarray(drain(run_request(ad, 100 + it * 10 + j)))
        ts.append((time.time() - t0) / len(seq))
    dt = min(ts)
    print(f"{label}: {dt:.3f} s/request ({BATCH/dt:.3f} canvases/s)", flush=True)
    return BATCH / dt


base = scenario("batch-8 no adapter", [None, None, None])
hits = scenario("batch-8 adapters a/b (LRU hits)", ["style_a", "style_b", "style_a", "style_b"])
miss = scenario("batch-8 adapters a/b/c (merge each)", ["style_a", "style_b", "style_c"])
import json
print(json.dumps({
    "metric": f"serving_canvases_per_sec_b{BATCH}_{STEPS}step",
    "no_adapter": round(base, 3), "adapter_lru_hit": round(hits, 3),
    "adapter_merge_each": round(miss, 3),
}), flush=True)
print("SERVING BENCH DONE", flush=True)
