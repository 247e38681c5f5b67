"""Round-3: e2e pipeline stage split on the chip — where do the ~0.33s/canvas
of non-UNet time go?  Stages jitted separately: cond build (CLIP + VAE encode
+ mask pack), the 50-step DDIM scan, VAE decode + composite.  int8 UNet
(bench default).  Per-measurement tunnel floor is ~33ms — stage-level only."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

print("backend:", jax.devices()[0].platform, flush=True)

from bench import build_full_bundle
from leftrefill_tpu.diffusion.core import Conditioning
from leftrefill_tpu.diffusion.ddim import ddim_sample
from leftrefill_tpu.models.clip import build_prompt_tokenizer
import warnings

model, params = build_full_bundle(quant=True)
with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    tok, sp, _ = build_prompt_tokenizer(["repeat_50_<special-token>"], ["init"])

b = 1
rng = np.random.RandomState(0)
image = jnp.asarray(rng.uniform(-1, 1, (b, 512, 1024, 3)), jnp.float32)
mask = jnp.concatenate(
    [jnp.zeros((b, 512, 512, 1)), jnp.ones((b, 512, 512, 1))], axis=2
).astype(jnp.float32)
tokens = jnp.asarray(np.repeat(np.asarray(tok.tokenize(" ".join(sp))), b, axis=0))
utokens = jnp.asarray(np.repeat(np.asarray(tok.tokenize("")), b, axis=0))

drain = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def timeit(name, fn, *args, iters=3):
    out = fn(*args)
    np.asarray(drain(out if isinstance(out, jax.Array) else out[0]))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(drain(out if isinstance(out, jax.Array) else out[0]))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1e3:.1f} ms", flush=True)
    return out


# params as jit ARGUMENTS (closure constants bake an 865M graph -> the
# known remote-compile "Broken pipe"; see CLAUDE.md known-issues)
@jax.jit
def build_cond(params, image, mask, tokens, utokens):
    masked = image * (mask < 0.5)
    cond = model.build_inpaint_cond(params, tokens, mask, masked)
    uc = model.get_learned_conditioning(params, utokens)
    return cond.c_concat, cond.c_crossattn, uc


@jax.jit
def scan_only(params, cc, cx, uc, key):
    cond = Conditioning(c_concat=cc, c_crossattn=cx)
    uncond = Conditioning(c_concat=cc, c_crossattn=uc)
    shape = (cc.shape[0], cc.shape[1], cc.shape[2], model.unet.out_channels)
    tables = model.schedule.ddim_tables(50, eta=1.0)
    return ddim_sample(
        model, lambda x, t, c: model.apply_model(params, x, t, c),
        tables, cond, key, shape, uncond=uncond, guidance_scale=2.5,
    )


@jax.jit
def decode_comp(params, z, image, mask):
    pred = model.decode_first_stage(params, z)
    pred = jnp.clip(pred, -1.0, 1.0)
    return pred * mask + image * (1.0 - mask)


key = jax.random.PRNGKey(0)
cc, cx, uc = timeit("cond build (CLIP + VAE encode)", build_cond, params, image, mask, tokens, utokens)
z = timeit("50-step DDIM scan", scan_only, params, cc, cx, uc, key)
out = timeit("VAE decode + composite", decode_comp, params, z, image, mask)
print("sum check ok, out shape", out.shape, flush=True)

# decode alone without composite, and encode alone, to split further
enc = jax.jit(lambda p, im: model.vae.apply({"params": p["vae"]}, im, method=model.vae.encode_moments))
try:
    timeit("VAE encode alone", enc, params, image * (mask < 0.5))
except Exception as e:
    print("encode-alone skipped:", repr(e), flush=True)
dec = jax.jit(lambda p, z: model.decode_first_stage(p, z))
timeit("VAE decode alone", dec, params, z)
clipf = jax.jit(lambda p, t: model.get_learned_conditioning(p, t))
timeit("CLIP text alone", clipf, params, tokens)
print("SPLIT DONE", flush=True)
