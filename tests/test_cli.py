"""End-to-end CLI smoke tests: train 2 steps on synthetic data, checkpoint,
then evaluate (reference flows: train_inpainting.py, test_inpainting.py)."""

import os
import pickle
import textwrap
from glob import glob

import cv2
import numpy as np
import pytest

MODEL_YAML = textwrap.dedent(
    """
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
          params: {in_channels: 9, out_channels: 4, model_channels: 16,
                   attention_resolutions: [1], num_res_blocks: 1,
                   channel_mult: [1, 2], num_head_channels: 8, context_dim: 24,
                   dtype: null}
        first_stage_config:
          target: ldm.models.autoencoder.AutoencoderKL
          params:
            embed_dim: 4
            ddconfig: {double_z: true, z_channels: 4, resolution: 64,
                       in_channels: 3, out_ch: 3, ch: 16, ch_mult: [1, 2],
                       num_res_blocks: 1, attn_resolutions: [], dropout: 0.0}
        cond_stage_config:
          target: ldm.modules.encoders.Refill_modules.PromptCLIPEmbedder
          params:
            layer: penultimate
            special_tokens: ["repeat_4_<special-token>"]
            init_text: ["two views of one scene"]
            width: 24
            heads: 2
            layers: 2
        data_config:
          img_size: 32
          cfg: 2.5
          sp_token: "<special-token>"
          repeat_sp_token: 4
          view_mask_rate: 0.0
          constant_place: true
        save_prompt_only: true
    """
)

TRAIN_YAML = textwrap.dedent(
    """
    model_config: '{model_cfg}'
    resume_path: null
    image_path: '{root}/image_dict.pkl'
    train_pair: '{root}/pairs.pkl'
    val_image_path: '{root}/testpairs'
    train_mask_path: ['{root}/irregular.txt', '{root}/segment.txt']
    val_mask_path: '{root}/masks'
    cross_view_inpainting: true
    n_sample_per_scene: 4
    batch_size: 2
    logger_freq: 1
    check_val_every_n_epoch: 1
    max_epochs: 1
    max_steps: 2
    save_top_k: 2
    log_ddim_steps: 4
    val_ddim_steps: 4
    val_batches: 1
    monitor: ssim
    optim_cfg: {{learning_rate: 1.0e-3, weight_decay: 0.01, lr_scheduler: none}}
    """
)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cliwork")
    rng = np.random.RandomState(0)
    # images
    image_dict, pairs = {}, []
    iid = 0
    for scene in ("0001", "0002"):
        for i in range(6):
            d = root / "mega" / scene / "imgs"
            d.mkdir(parents=True, exist_ok=True)
            p = d / f"im{i}.jpg"
            cv2.imwrite(str(p), rng.randint(0, 255, (48, 48, 3), np.uint8))
            image_dict[iid] = str(p)
            iid += 1
    for s in range(2):
        base = s * 6
        for i in range(5):
            pairs.append({"source": base + i, "target": base + i + 1, "prompt": "x"})
    with open(root / "image_dict.pkl", "wb") as f:
        pickle.dump(image_dict, f)
    with open(root / "pairs.pkl", "wb") as f:
        pickle.dump(pairs, f)
    # masks
    (root / "masks").mkdir()
    mask_files = []
    for i in range(3):
        p = root / "masks" / f"m{i}.png"
        m = np.zeros((32, 32), np.uint8)
        m[4 * i : 4 * i + 16, 4 * i : 4 * i + 16] = 255
        cv2.imwrite(str(p), m)
        mask_files.append(str(p))
    (root / "irregular.txt").write_text("\n".join(mask_files[:2]))
    (root / "segment.txt").write_text(mask_files[2])
    # test pairs
    for i in range(2):
        d = root / "testpairs" / f"{i:06d}"
        d.mkdir(parents=True)
        cv2.imwrite(str(d / "source.jpg"), rng.randint(0, 255, (48, 48, 3), np.uint8))
        cv2.imwrite(str(d / "target.jpg"), rng.randint(0, 255, (48, 48, 3), np.uint8))
        m = np.zeros((32, 32), np.uint8)
        m[8:24, 8:24] = 255
        cv2.imwrite(str(d / "mask.png"), m)
    # configs
    model_cfg = root / "model_config.yaml"
    model_cfg.write_text(MODEL_YAML)
    train_cfg = root / "training_config.yaml"
    train_cfg.write_text(TRAIN_YAML.format(model_cfg=model_cfg, root=root))
    return root


@pytest.mark.slow
def test_train_cli_end_to_end(workdir):
    from leftrefill_tpu.cli.train import main

    save = workdir / "ckroot"
    rc = main(
        [
            "--config_file", str(workdir / "training_config.yaml"),
            "--exp_name", "smoke",
            "--save_path", str(save),
            "--no_restore",
            "--nchip", "2",  # per-host batch = 2*2 = 4 of the 8 samples
        ]
    )
    assert rc == 0
    exp = save / "smoke"
    assert (exp / "training_config.yaml").exists()
    assert (exp / "metrics.jsonl").exists()
    assert (exp / "ckpts" / "last").exists()
    assert glob(str(exp / "samples" / "*.jpg"))
    # restore path: resumes from the prompt-only ckpt without error
    rc = main(
        [
            "--config_file", str(workdir / "training_config.yaml"),
            "--exp_name", "smoke",
            "--save_path", str(save),
            "--restore", "--no_restore",
            "--max_steps", "3",
            "--nchip", "2",
        ]
    )
    assert rc == 0


@pytest.mark.slow
def test_eval_cli_end_to_end(workdir):
    from leftrefill_tpu.cli.test import main

    exp = workdir / "ckroot" / "smoke"
    out = workdir / "outputs"
    mo = workdir / "metric_outputs"
    rc = main(
        [
            "--model_path", str(exp),
            "--test_path", str(workdir / "testpairs"),
            "--test_size", "32",
            "--ddim_steps", "4",
            "--cfg", "2.5",
            "--batch_size", "2",
            "--output_path", str(out),
            "--metric_output", str(mo),
        ]
    )
    assert rc == 0
    txts = glob(str(mo / "*.txt"))
    assert txts
    content = open(txts[0]).read()
    assert "PSNR:" in content and "SSIM:" in content
    assert glob(str(out / "*" / "*.png"))


@pytest.mark.slow
def test_sample_cli(workdir):
    """One-shot sample CLI on the trained smoke experiment."""
    from leftrefill_tpu.cli.sample import main

    exp = workdir / "ckroot" / "smoke"
    assert (exp / "model_config.yaml").exists(), "run after the train smoke"
    pair = workdir / "testpairs" / "000000"
    out = workdir / "sample_out.png"
    rc = main(
        [
            "--model_path", str(exp),
            "--reference", str(pair / "source.jpg"),
            "--source", str(pair / "target.jpg"),
            "--mask", str(pair / "mask.png"),
            "--out", str(out),
            "--ddim_steps", "4",
            "--img_size", "32",
        ]
    )
    assert rc == 0
    assert out.exists()
    img = cv2.imread(str(out))
    assert img.shape == (32, 32, 3)


@pytest.mark.slow
def test_eval_cli_metric_size_and_x4(workdir):
    """--metric_size area-downsampling + --manual_pairs_x4 repetition
    (test_inpainting.py:132-146)."""
    from leftrefill_tpu.cli.test import main

    exp = workdir / "ckroot" / "smoke"
    mo = workdir / "metric_outputs_x4"
    rc = main(
        [
            "--model_path", str(exp),
            "--test_path", str(workdir / "testpairs"),
            "--test_size", "32",
            "--metric_size", "16",
            "--ddim_steps", "4",
            "--batch_size", "1",
            "--manual_pairs_x4",
            "--save_single",
            "--output_path", str(workdir / "out_x4"),
            "--metric_output", str(mo),
        ]
    )
    assert rc == 0
    # 4 singles per batch at metric... singles saved at test_size crop
    assert len(glob(str(workdir / "out_x4" / "*" / "*.png"))) >= 4
