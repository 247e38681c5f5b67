"""One-shot inference CLI: reference + target + mask -> inpainted result.

A minimal headless counterpart of the gradio app
(ref_inpainting_gradio.py predict flow) for scripting and smoke checks.

Usage:
  python -m leftrefill_tpu.cli.sample --model_path check_points/run1 \
      --reference ref.png --source src.png --mask mask.png --out out.png
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True, help="experiment dir")
    p.add_argument("--reference", required=True)
    p.add_argument("--source", required=True)
    p.add_argument("--mask", required=True)
    p.add_argument("--out", default="out.png")
    p.add_argument("--sd_ckpt", default=None)
    p.add_argument("--ddim_steps", default=50, type=int)
    p.add_argument("--sampler", default="ddim", choices=["ddim", "dpm++2m"],
                   help="dpm++2m with --ddim_steps 15 is the measured fast "
                        "path (more solver-accurate than ddim@50, ~2.8x "
                        "faster; PARITY.md r4)")
    p.add_argument("--scale", default=2.5, type=float)
    p.add_argument("--seed", default=42, type=int)
    p.add_argument("--num_samples", default=1, type=int)
    p.add_argument("--img_size", default=512, type=int)
    args = p.parse_args(argv)

    import cv2

    from leftrefill_tpu.serving.gradio_app import initialize_model, predict

    pipe = initialize_model(args.model_path, args.sd_ckpt, img_size=args.img_size)
    reference = cv2.cvtColor(cv2.imread(args.reference), cv2.COLOR_BGR2RGB)
    source = cv2.cvtColor(cv2.imread(args.source), cv2.COLOR_BGR2RGB)
    mask = cv2.imread(args.mask, cv2.IMREAD_GRAYSCALE)
    outs = predict(
        pipe, reference, source, mask,
        ddim_steps=args.ddim_steps, num_samples=args.num_samples,
        scale=args.scale, seed=args.seed, img_size=args.img_size,
        sampler=args.sampler,
    )
    for i, o in enumerate(outs):
        path = args.out if len(outs) == 1 else args.out.replace(".png", f"_{i}.png")
        cv2.imwrite(path, cv2.cvtColor(o, cv2.COLOR_RGB2BGR))
        print("wrote", path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
