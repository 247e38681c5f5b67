"""Round-4, VERDICT item 8: batch-throughput autopsy.  r3 measured b4 e2e at
0.43 canvases/s < b1's 0.7155 — batching LOSES 40% per canvas, which a
compute-bound pipeline should never do.  This script splits the b-scaling per
stage to find what scales superlinearly:

  - UNet forward (int8, CFG batch): 2, 4, 8 — chained in-graph timing
    (lax.scan, output->input) per CLAUDE.md microbench discipline;
  - the full DDIM-50 scan at b=1 vs b=4;
  - VAE decode at b=1 vs b=4;
  - cond build at b=1 vs b=4.

Run detached (ONE TPU process at a time):
  nohup python scripts/tpu_r4_b4_split.py > /tmp/b4_split_r4.log 2>&1 &
"""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

print("backend:", jax.devices()[0].platform, flush=True)

from leftrefill_tpu.runtime import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

from bench import build_full_bundle
from leftrefill_tpu.diffusion.core import Conditioning
from leftrefill_tpu.diffusion.ddim import ddim_sample
from leftrefill_tpu.models.clip import build_prompt_tokenizer
import warnings

model, params = build_full_bundle(quant=True)
with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    tok, sp, _ = build_prompt_tokenizer(["repeat_50_<special-token>"], ["init"])

drain = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))

# --- UNet forward scaling: chained lax.scan timing at CFG batch 2/4/8 -------
N_CHAIN = 20
unet = model.unet


def fwd_chain(bb):
    x = jax.random.normal(jax.random.PRNGKey(0), (bb, 64, 128, 9), jnp.bfloat16)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (bb, 77, 1024), jnp.bfloat16)
    t = jnp.full((bb,), 500, jnp.int32)

    @jax.jit
    def run(p, x, t, ctx):
        def body(c, _):
            out = unet.apply({"params": p}, c, t, ctx)
            # chain eps (4ch) back into the 9ch input so XLA can't hoist
            c2 = jnp.concatenate([out.astype(c.dtype), c[..., 4:]], axis=-1)
            return c2, None

        c, _ = jax.lax.scan(body, x, None, length=N_CHAIN)
        return c

    up = params["unet"]
    np.asarray(drain(run(up, x, t, ctx)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(drain(run(up, x, t, ctx)))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1e3 / N_CHAIN
    print(json.dumps({"unet_fwd_cfg_batch": bb, "ms_per_fwd": round(ms, 2),
                      "ms_per_canvas_equiv": round(ms / (bb / 2), 2)}), flush=True)


for bb in (2, 4, 8):
    fwd_chain(bb)

# --- stage scaling at b=1 vs b=4 --------------------------------------------
def stages(b):
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.uniform(-1, 1, (b, 512, 1024, 3)), jnp.float32)
    mask = jnp.concatenate(
        [jnp.zeros((b, 512, 512, 1)), jnp.ones((b, 512, 512, 1))], axis=2
    ).astype(jnp.float32)
    tokens = jnp.asarray(np.repeat(np.asarray(tok.tokenize(" ".join(sp))), b, axis=0))
    utokens = jnp.asarray(np.repeat(np.asarray(tok.tokenize("")), b, axis=0))

    @jax.jit
    def build_cond(params, image, mask, tokens, utokens):
        masked = image * (mask < 0.5)
        cond = model.build_inpaint_cond(params, tokens, mask, masked)
        uc = model.get_learned_conditioning(params, utokens)
        return cond.c_concat, cond.c_crossattn, uc

    @jax.jit
    def scan_only(params, cc, cx, uc, key):
        # mirrors pipeline._generate's fast config: KV cache + cfg_dup
        cond = Conditioning(c_concat=cc, c_crossattn=cx)
        uncond = Conditioning(c_concat=cc, c_crossattn=uc)
        tables = model.schedule.ddim_tables(50, eta=1.0)
        kv = model.cross_attention_kv(params, jnp.concatenate([uc, cx], axis=0))
        apply_fn = lambda x, t, c: model.apply_model(
            params, x, t, c, cross_kv=kv, cfg_dup=True
        )
        return ddim_sample(
            model, apply_fn, tables, cond, key, (b, 64, 128, 4),
            uncond=uncond, guidance_scale=2.5,
        )

    @jax.jit
    def decode(params, z):
        return model.decode_first_stage(params, z)

    def timeit(name, fn, *args, iters=3):
        out = fn(*args)
        np.asarray(drain(out if isinstance(out, jax.Array) else out[0]))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(drain(out if isinstance(out, jax.Array) else out[0]))
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"stage": name, "b": b, "ms": round(min(ts) * 1e3, 1)}),
              flush=True)
        return out

    cc, cx, uc = timeit("cond_build", build_cond, params, image, mask, tokens, utokens)
    z = timeit("ddim50_scan", scan_only, params, cc, cx, uc, jax.random.PRNGKey(0))
    timeit("vae_decode", decode, params, z)


for b in (1, 4):
    stages(b)
print("B4 SPLIT DONE", flush=True)
