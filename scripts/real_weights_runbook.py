"""Real-weights readiness runbook (VERDICT r2 item 4).

ONE command from artifacts to numbers.  When the SD2 512-inpainting ckpt,
the OpenCLIP BPE merges file, and LPIPS weights become available:

    python scripts/real_weights_runbook.py \
        --sd_ckpt 512-inpainting-ema.ckpt \
        --bpe_merges bpe_simple_vocab_16e6.txt.gz \
        --lpips_weights lpips_alex.pth [--alexnet alexnet.pth] \
        --model_config configs/ref_inpainting.yaml \
        --prompt_ckpt check_points/ref_guided_inpainting/ckpts \
        --test_path <megadepth match_test_image_pairs dir> \
        --out runbook_out [--limit 25]

Stages (each prints PASS/FAIL + numbers, all results land in --out):
  1. tokenizer      — real-BPE engine from the merges file; with the full
                      OpenCLIP vocab, asserts the canonical ids of
                      'a photo of a cat' (49406,320,1125,539,320,2368,49407).
  2. convert        — torch ckpt -> flax params via convert/torch_to_flax;
                      reports missing/unexpected key counts.
  3. golden         — loads the SAME ckpt into torch oracles (reference
                      UNet + VAE code, open_clip-layout text tower) and
                      asserts fp32 forward parity tower-by-tower.
  4. eval           — the full test_inpainting.py protocol via cli/test.py
                      (composite, right-half crop, PSNR/SSIM/LPIPS, txt).
  5. int8 A/B       — serving pipelines bf16 vs W8A8 on the first --limit
                      test pairs: per-model metrics + cross-PSNR.

--synthetic: builds tiny stand-in artifacts (random torch ckpt written with
the reference modules' real state_dict layout, handcrafted merges, random
LPIPS weights, synthetic test pairs) and runs every stage end-to-end — the
dry run that keeps this script executable before the real artifact day
(tested in tests/test_runbook.py).
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CANONICAL = [49406, 320, 1125, 539, 320, 2368, 49407]  # 'a photo of a cat'


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sd_ckpt")
    p.add_argument("--bpe_merges")
    p.add_argument("--lpips_weights")
    p.add_argument("--alexnet", default=None)
    p.add_argument("--model_config")
    p.add_argument("--prompt_ckpt", default=None, help="trained ckpts/ dir (optional)")
    p.add_argument("--test_path")
    p.add_argument("--out", default="runbook_out")
    p.add_argument("--limit", type=int, default=25)
    p.add_argument("--test_size", type=int, default=512)
    p.add_argument("--synthetic", action="store_true",
                   help="build tiny stand-in artifacts and dry-run all stages")
    p.add_argument("--skip", default="", help="comma list: tokenizer,convert,golden,eval,ab")
    return p.parse_args(argv)


# ---------------------------------------------------------------------------
# synthetic artifact builder


def build_synthetic(out: str) -> dict:
    """Tiny stand-ins with the REAL artifact formats: torch ckpt holding
    reference-module state_dicts, gzip merges, torch LPIPS weights, and a
    {source,target,mask} test-pair tree."""
    import types

    import torch

    import cv2

    syn = os.path.join(out, "synthetic")
    os.makedirs(syn, exist_ok=True)
    REF = "/root/reference"
    if REF not in sys.path:
        sys.path.insert(0, REF)
    for name in ("torchvision", "torchvision.utils", "torchvision.transforms"):
        sys.modules.setdefault(name, types.ModuleType(name))
    if "omegaconf" not in sys.modules:
        om = types.ModuleType("omegaconf")
        om.__path__ = []
        om.OmegaConf = type("OmegaConf", (), {})
        om.ListConfig = list
        om.DictConfig = dict
        lc = types.ModuleType("omegaconf.listconfig")
        lc.ListConfig = list
        sys.modules["omegaconf"] = om
        sys.modules["omegaconf.listconfig"] = lc
    import ldm.modules.diffusionmodules.model as vae_model
    import ldm.modules.diffusionmodules.openaimodel as openaimodel

    from leftrefill_tpu.convert.torch_oracle import build_text_tower_oracle

    torch.manual_seed(0)

    def rand_(m, scale=0.05):
        g = torch.Generator().manual_seed(1)
        with torch.no_grad():
            for q in m.parameters():
                q.copy_(torch.randn(q.shape, generator=g) * scale)

    # tiny but structurally-complete reference UNet (matches the YAML below)
    unet = openaimodel.UNetModel(
        image_size=32, use_spatial_transformer=True, use_linear_in_transformer=True,
        in_channels=9, out_channels=4, model_channels=32,
        attention_resolutions=[1], num_res_blocks=1, channel_mult=[1, 2],
        num_head_channels=8, transformer_depth=1, context_dim=24, legacy=False,
    )
    rand_(unet)
    ddconfig = dict(
        double_z=True, z_channels=4, resolution=64, in_channels=3, out_ch=3,
        ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[], dropout=0.0,
    )
    enc = vae_model.Encoder(**ddconfig)
    dec = vae_model.Decoder(**ddconfig)
    quant = torch.nn.Conv2d(8, 8, 1)
    post = torch.nn.Conv2d(4, 4, 1)
    for m in (enc, dec, quant, post):
        rand_(m)
    tower = build_text_tower_oracle(
        vocab=49408, width=24, heads=2, layers=2, n_special=4, ctx_len=77
    )
    rand_(tower)

    sd = {}
    sd.update({f"model.diffusion_model.{k}": v for k, v in unet.state_dict().items()})
    sd.update({f"first_stage_model.encoder.{k}": v for k, v in enc.state_dict().items()})
    sd.update({f"first_stage_model.decoder.{k}": v for k, v in dec.state_dict().items()})
    sd.update({f"first_stage_model.quant_conv.{k}": v for k, v in quant.state_dict().items()})
    sd.update({f"first_stage_model.post_quant_conv.{k}": v for k, v in post.state_dict().items()})
    # the real ckpt's text tower keys; special_embeddings excluded (trained)
    sd.update({
        f"cond_stage_model.{k}": v
        for k, v in tower.state_dict().items()
        if not k.startswith("special_embeddings")
    })
    ckpt = os.path.join(syn, "sd_stand_in.ckpt")
    torch.save({"state_dict": sd}, ckpt)

    merges = os.path.join(syn, "merges.txt.gz")
    with gzip.open(merges, "wt") as f:
        f.write("#version: 0.2\nh e\nl l\nhe ll\nhell o</w>\na photo</w>\n")

    lpips = os.path.join(syn, "lpips_alex.pth")
    torch.save({f"lin{i}.model.1.weight": torch.rand(1, c, 1, 1) * 0.01
                for i, c in enumerate([64, 192, 384, 256, 256])}, lpips)

    rng = np.random.RandomState(0)
    test_path = os.path.join(syn, "testpairs")
    for i in range(3):
        d = os.path.join(test_path, f"{i:06d}")
        os.makedirs(d, exist_ok=True)
        cv2.imwrite(os.path.join(d, "source.jpg"), rng.randint(0, 255, (48, 48, 3), np.uint8))
        cv2.imwrite(os.path.join(d, "target.jpg"), rng.randint(0, 255, (48, 48, 3), np.uint8))
        m = np.zeros((48, 48), np.uint8)
        m[8:40, 8:40] = 255
        cv2.imwrite(os.path.join(d, "mask.png"), m)

    cfg = os.path.join(syn, "model_config.yaml")
    with open(cfg, "w") as f:
        f.write(SYN_YAML)
    return dict(sd_ckpt=ckpt, bpe_merges=merges, lpips_weights=lpips,
                test_path=test_path, model_config=cfg, test_size=32)


SYN_YAML = """
model:
  target: inpainting_ldm.ref_inpainting_ldm.RefInpaintLDM
  params:
    linear_start: 0.00085
    linear_end: 0.0120
    timesteps: 1000
    conditioning_key: hybrid
    scale_factor: 0.18215
    unet_config:
      target: ldm.modules.diffusionmodules.openaimodel.UNetModel
      params: {in_channels: 9, out_channels: 4, model_channels: 32,
               attention_resolutions: [1], num_res_blocks: 1,
               channel_mult: [1, 2], num_head_channels: 8, context_dim: 24}
    first_stage_config:
      target: ldm.models.autoencoder.AutoencoderKL
      params:
        embed_dim: 4
        ddconfig: {double_z: true, z_channels: 4, resolution: 64, in_channels: 3,
                   out_ch: 3, ch: 32, ch_mult: [1, 2], num_res_blocks: 1,
                   attn_resolutions: [], dropout: 0.0}
    cond_stage_config:
      target: ldm.modules.encoders.Refill_modules.PromptCLIPEmbedder
      params:
        layer: penultimate
        special_tokens: ["repeat_4_<special-token>"]
        init_text: ["two views of one scene"]
        width: 24
        heads: 2
        layers: 2
    data_config: {img_size: 32, cfg: 2.5, sp_token: "<special-token>", repeat_sp_token: 4}
    save_prompt_only: true
"""


# ---------------------------------------------------------------------------
# stages


def stage_tokenizer(args, report):
    from leftrefill_tpu.models.tokenizer import SimpleTokenizer

    tok = SimpleTokenizer(bpe_path=args.bpe_merges, special_tokens=["<special-token0>"])
    ids = np.asarray(tok.tokenize("a photo of a cat"))[0]
    got = [int(v) for v in ids[:7]]
    # the id SPACE is always 49408; only a real merges file (~48k merges)
    # carries the canonical vocab
    with gzip.open(args.bpe_merges, "rt") as f:
        n_merges = sum(1 for _ in f) - 1
    full_vocab = n_merges > 40000
    if full_vocab:
        ok = got == CANONICAL
        report["tokenizer"] = {"ok": ok, "ids": got, "expected": CANONICAL}
        print(f"[tokenizer] full OpenCLIP vocab; canonical ids "
              f"{'MATCH' if ok else 'MISMATCH: ' + str(got)}")
    else:
        # stand-in merges: check the BPE engine round-trips and uses sot/eot
        ok = got[0] == 49406 and 49407 in ids
        report["tokenizer"] = {"ok": ok, "ids": got, "note": "stand-in merges (engine smoke)"}
        print(f"[tokenizer] stand-in merges; engine {'OK' if ok else 'BROKEN'} ids={got}")
    return ok


def stage_convert(args, report):
    import jax

    from leftrefill_tpu.config import build_model_from_config, load_yaml
    from leftrefill_tpu.convert.torch_to_flax import load_torch_state_dict
    from leftrefill_tpu.tasks import build_task

    cfg = load_yaml(args.model_config)
    cfg["model"]["params"]["cond_stage_config"]["params"]["bpe_path"] = args.bpe_merges
    bundle = build_model_from_config(cfg)
    task = build_task(bundle)
    sd = load_torch_state_dict(args.sd_ckpt)
    latent = (args.test_size // 8, args.test_size // 4)

    from leftrefill_tpu.convert.torch_to_flax import convert_state_dict, merge_params

    base = task.init_params(jax.random.PRNGKey(0), latent_hw=latent)
    loaded, skipped = convert_state_dict(sd)
    params, missing, unexpected = merge_params(base, loaded)
    # special_embeddings is trained, never in the SD ckpt
    missing = [m for m in missing if "special_embeddings" not in m]
    ok = not unexpected and len(missing) == 0 and len(skipped) < 5
    report["convert"] = {
        "ok": ok,
        "loaded_keys": len(sd),
        "skipped": len(skipped),
        "missing": missing[:10],
        "unexpected": unexpected[:10],
    }
    print(f"[convert] {len(sd)} ckpt keys; skipped={len(skipped)} "
          f"missing={len(missing)} unexpected={len(unexpected)} -> "
          f"{'PASS' if ok else 'FAIL'}")
    return ok, (cfg, bundle, task, params, sd)


def stage_golden(args, report, cfg, bundle, params, sd):
    """fp32 golden activations: the SAME ckpt loaded into torch oracles."""
    import types

    import jax
    import jax.numpy as jnp
    import torch

    REF = "/root/reference"
    if REF not in sys.path:
        sys.path.insert(0, REF)
    for name in ("torchvision", "torchvision.utils", "torchvision.transforms"):
        sys.modules.setdefault(name, types.ModuleType(name))
    import ldm.modules.diffusionmodules.model as vae_model
    import ldm.modules.diffusionmodules.openaimodel as openaimodel

    p = cfg["model"]["params"]
    up = dict(p["unet_config"]["params"])
    tm = openaimodel.UNetModel(
        image_size=32, use_spatial_transformer=True, use_linear_in_transformer=True,
        legacy=False, transformer_depth=1, **up,
    ).eval().float()
    usd = {k[len("model.diffusion_model."):]: torch.tensor(v)
           for k, v in sd.items() if k.startswith("model.diffusion_model.")}
    # the real EMA ckpt stores 'model_ema.*' too; torch_to_flax handles the
    # preference — here plain keys are enough for the oracle
    miss, unexp = tm.load_state_dict(usd, strict=False)
    print(f"[golden] torch UNet load: missing={len(miss)} unexpected={len(unexp)}")

    rng = np.random.RandomState(0)
    h = args.test_size // 8
    w = args.test_size // 4
    x = rng.randn(1, 9, h, w).astype(np.float32) * 0.5
    t = np.array([500])
    ctx = rng.randn(1, 77, up["context_dim"]).astype(np.float32) * 0.3
    with torch.no_grad():
        ref_eps = tm(torch.tensor(x), torch.tensor(t), context=torch.tensor(ctx)).numpy()

    m = bundle.model
    fm32 = m.unet.clone(dtype=jnp.float32)
    ours = np.asarray(jax.jit(
        lambda pp, xx, tt, cc: fm32.apply({"params": pp}, xx, tt, cc)
    )(params["unet"], jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t), jnp.asarray(ctx)))
    d_unet = float(np.abs(ours.transpose(0, 3, 1, 2) - ref_eps).max())
    s_unet = float(np.abs(ref_eps).max())

    # VAE encoder moments
    ddcfg = dict(p["first_stage_config"]["params"]["ddconfig"])
    enc = vae_model.Encoder(**ddcfg).eval().float()
    q = torch.nn.Conv2d(2 * ddcfg["z_channels"], 2 * p["first_stage_config"]["params"]["embed_dim"], 1)
    esd = {k[len("first_stage_model.encoder."):]: torch.tensor(v)
           for k, v in sd.items() if k.startswith("first_stage_model.encoder.")}
    enc.load_state_dict(esd, strict=False)
    qsd = {k[len("first_stage_model.quant_conv."):]: torch.tensor(v)
           for k, v in sd.items() if k.startswith("first_stage_model.quant_conv.")}
    q.load_state_dict(qsd, strict=False)
    img = rng.randn(1, 3, 8 * 8, 8 * 8).astype(np.float32) * 0.5
    with torch.no_grad():
        ref_mom = q(enc(torch.tensor(img))).numpy()
    vae32 = m.vae.clone(dtype=jnp.float32)
    mom = np.asarray(jax.jit(
        lambda pp, xx: vae32.apply({"params": pp}, xx, method=vae32.encode_moments)
    )(params["vae"], jnp.asarray(img.transpose(0, 2, 3, 1))))
    d_vae = float(np.abs(mom.transpose(0, 3, 1, 2) - ref_mom).max())
    s_vae = float(np.abs(ref_mom).max())

    # text tower (open_clip layout oracle)
    from leftrefill_tpu.convert.torch_oracle import build_text_tower_oracle

    cp = p["cond_stage_config"]["params"]
    tower = build_text_tower_oracle(
        vocab=49408, width=cp.get("width", 1024), heads=cp.get("heads", 16),
        layers=cp.get("layers", 24),
        n_special=len(bundle.cond_bundle.special_tokens), ctx_len=77,
    ).eval().float()
    tsd = {k[len("cond_stage_model."):]: torch.tensor(v)
           for k, v in sd.items() if k.startswith("cond_stage_model.")}
    # inject OUR (possibly trained) special embeddings so both sides match
    tsd["special_embeddings.weight"] = torch.tensor(
        np.asarray(params["cond"]["special_embeddings"])
    )
    tower.load_state_dict(tsd, strict=False)
    tokens = np.asarray(bundle.cond_bundle.tokenizer.tokenize("a photo of a cat"))
    with torch.no_grad():
        ref_txt = tower(torch.tensor(tokens.astype(np.int64))).numpy()
    cm32 = m.cond_model.clone(dtype=jnp.float32)
    txt = np.asarray(jax.jit(
        lambda pp, tt: cm32.apply({"params": pp}, tt)
    )(params["cond"], jnp.asarray(tokens)))
    d_txt = float(np.abs(txt - ref_txt).max())
    s_txt = float(np.abs(ref_txt).max())

    tol = 3e-3  # fp32, 865M-deep towers: per-op noise accumulates
    ok = d_unet < tol * max(s_unet, 1) and d_vae < tol * max(s_vae, 1) and d_txt < tol * max(s_txt, 1)
    report["golden"] = {
        "ok": ok,
        "unet_maxdiff": d_unet, "unet_ref_max": s_unet,
        "vae_maxdiff": d_vae, "vae_ref_max": s_vae,
        "clip_maxdiff": d_txt, "clip_ref_max": s_txt,
    }
    print(f"[golden] unet {d_unet:.2e}/{s_unet:.2e}  vae {d_vae:.2e}/{s_vae:.2e}  "
          f"clip {d_txt:.2e}/{s_txt:.2e} -> {'PASS' if ok else 'FAIL'}")
    return ok


def stage_eval(args, report, exp_dir):
    from leftrefill_tpu.cli import test as test_cli

    out = os.path.join(args.out, "eval")
    argv = [
        "--model_path", exp_dir,
        "--test_path", args.test_path,
        "--sd_ckpt", args.sd_ckpt,
        "--test_size", str(args.test_size),
        "--metric_size", str(args.test_size),
        "--output_path", out,
        "--metric_output", os.path.join(args.out, "metric_outputs"),
        "--limit", str(args.limit),
        "--ddim_steps", "50" if not args.synthetic else "4",
    ]
    if args.lpips_weights:
        argv += ["--lpips_weights", args.lpips_weights]
    rc = test_cli.main(argv)
    files = []
    mdir = os.path.join(args.out, "metric_outputs")
    if os.path.isdir(mdir):
        files = [os.path.join(mdir, f) for f in os.listdir(mdir) if f.endswith(".txt")]
    ok = rc == 0 and files
    report["eval"] = {"ok": bool(ok), "metric_files": files}
    if files:
        print(f"[eval] {open(files[0]).read().strip()}")
    print(f"[eval] -> {'PASS' if ok else 'FAIL'}")
    return ok


def stage_ab(args, report, exp_dir):
    import cv2
    import jax

    from leftrefill_tpu.eval.metrics import composite_metrics
    from leftrefill_tpu.serving.gradio_app import initialize_model

    results = {}
    outs = {}
    variants = (("bf16", False, False), ("int8", True, False), ("int8+vae8", True, True))
    for name, quant, qvae in variants:
        pipe = initialize_model(
            exp_dir, args.sd_ckpt, img_size=args.test_size, quantized=quant,
            quant_vae=qvae,
        )
        import dataclasses

        pipe = dataclasses.replace(pipe, ddim_steps=4 if args.synthetic else 50)
        rng = np.random.RandomState(0)
        dirs = sorted(os.listdir(args.test_path))[: max(2, min(args.limit, 8))]
        preds, metrics = [], []
        for d in dirs:
            dd = os.path.join(args.test_path, d)
            src = cv2.resize(cv2.imread(os.path.join(dd, "source.jpg")), (args.test_size,) * 2)
            tgt = cv2.resize(cv2.imread(os.path.join(dd, "target.jpg")), (args.test_size,) * 2)
            from leftrefill_tpu.pipeline import stitch_canvas

            ref_img = (src[None].astype(np.float32) / 127.5 - 1.0)
            tgt_img = (tgt[None].astype(np.float32) / 127.5 - 1.0)
            image, mask = stitch_canvas(ref_img, tgt_img, np.ones((1, args.test_size, args.test_size, 1), np.float32))
            out = np.asarray(pipe(image, mask, jax.random.PRNGKey(7)))
            preds.append(out)
            m = jax.jit(composite_metrics)(out, image, mask)
            metrics.append({k: float(np.mean(np.asarray(v))) for k, v in m.items() if k in ("psnr", "ssim")})
        outs[name] = np.concatenate(preds)
        results[name] = {
            k: float(np.mean([mm[k] for mm in metrics])) for k in metrics[0]
        }
    for other in ("int8", "int8+vae8"):
        mse = float(((outs["bf16"] - outs[other]) ** 2).mean())
        results[f"cross_psnr_bf16_vs_{other}_db"] = float(
            10 * np.log10(4.0 / max(mse, 1e-12))
        )
    cross = results["cross_psnr_bf16_vs_int8_db"]
    ok = all(
        np.isfinite(results[f"cross_psnr_bf16_vs_{o}_db"]) for o in ("int8", "int8+vae8")
    )
    report["ab"] = {"ok": bool(ok), **results}
    print(f"[ab] bf16={results['bf16']} int8={results['int8']} "
          f"int8+vae8={results['int8+vae8']} cross_psnr={cross:.2f}dB "
          f"-> {'PASS' if ok else 'FAIL'}")
    return ok


def main(argv=None) -> int:
    args = parse_args(argv)
    os.makedirs(args.out, exist_ok=True)
    if args.synthetic:
        paths = build_synthetic(args.out)
        for k, v in paths.items():
            setattr(args, k, v)
    for req in ("sd_ckpt", "bpe_merges", "model_config", "test_path"):
        if not getattr(args, req):
            print(f"missing --{req} (or use --synthetic)")
            return 2

    # runbook exp dir: patched config (+ trained ckpts if provided)
    exp_dir = os.path.join(args.out, "exp")
    os.makedirs(exp_dir, exist_ok=True)
    from leftrefill_tpu.config import load_yaml

    cfg = load_yaml(args.model_config)
    cfg["model"]["params"]["cond_stage_config"]["params"]["bpe_path"] = args.bpe_merges
    import yaml

    with open(os.path.join(exp_dir, "model_config.yaml"), "w") as f:
        yaml.safe_dump(cfg, f)
    if args.prompt_ckpt and os.path.isdir(args.prompt_ckpt):
        dst = os.path.join(exp_dir, "ckpts")
        if not os.path.exists(dst):
            shutil.copytree(args.prompt_ckpt, dst)

    skip = set(s for s in args.skip.split(",") if s)
    report: dict = {}
    ok = True
    if "tokenizer" not in skip:
        ok &= bool(stage_tokenizer(args, report))
    state = None
    if "convert" not in skip:
        c_ok, state = stage_convert(args, report)
        ok &= c_ok
    if "golden" not in skip and state is not None:
        cfg_, bundle, task, params, sd = state
        ok &= bool(stage_golden(args, report, cfg_, bundle, params, sd))
    if "eval" not in skip:
        ok &= bool(stage_eval(args, report, exp_dir))
    if "ab" not in skip:
        ok &= bool(stage_ab(args, report, exp_dir))

    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(f"RUNBOOK {'PASS' if ok else 'FAIL'} -> {os.path.join(args.out, 'report.json')}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
