"""Multi-view and NVS end-to-end CLI smoke tests on synthetic data
(reference flows: multiview_ref_inpainting_ldm.py + NVS_ldm.py training)."""

import math
import os
import pickle
import textwrap
from glob import glob

import cv2
import numpy as np
import pytest

MV_MODEL_YAML = textwrap.dedent(
    """
    model:
      target: inpainting_ldm.multiview_ref_inpainting_ldm.RefInpaintLDM
      params:
        linear_start: 0.00085
        linear_end: 0.0120
        timesteps: 1000
        conditioning_key: hybrid
        scale_factor: 0.18215
        view_num: 2
        concat_target: false
        reduced_loss: true
        unet_config:
          target: ldm.modules.diffusionmodules.multiview_unet.MultiViewUnetModel
          params: {in_channels: 9, out_channels: 4, model_channels: 16,
                   attention_resolutions: [1], num_res_blocks: 1,
                   channel_mult: [1, 2], num_head_channels: 8, context_dim: 24,
                   view_num: 2, concat_target: false, dtype: null}
        first_stage_config:
          target: ldm.models.autoencoder.AutoencoderKL
          params:
            embed_dim: 4
            ddconfig: {double_z: true, z_channels: 4, resolution: 64,
                       in_channels: 3, out_ch: 3, ch: 16, ch_mult: [1, 2],
                       num_res_blocks: 1, attn_resolutions: [], dropout: 0.0}
        cond_stage_config:
          target: ldm.modules.encoders.cyn_mod_PGIC_modules.PromptCLIPEmbedder
          params:
            layer: penultimate
            special_tokens: ["repeat_2_<special-token>"]
            init_text: ["two views"]
            view_num: 2
            view_token_len: 2
            width: 24
            heads: 2
            layers: 2
        data_config:
          img_size: 32
          cfg: 2.5
          sp_token: "<special-token>"
          repeat_sp_token: 2
          view_num: 2
          view_token_len: 2
          view_mask_rate: 0.0
        save_prompt_only: true
    """
)

NVS_MODEL_YAML = textwrap.dedent(
    """
    model:
      target: inpainting_ldm.NVS_ldm.NVSLDM
      params:
        linear_start: 0.00085
        linear_end: 0.0120
        timesteps: 1000
        conditioning_key: hybrid-refine
        scale_factor: 0.18215
        unet_config:
          target: ldm.modules.diffusionmodules.openaimodel.UNetModel
          params: {in_channels: 9, out_channels: 4, model_channels: 16,
                   attention_resolutions: [1], num_res_blocks: 1,
                   channel_mult: [1, 2], num_head_channels: 8, context_dim: 24,
                   use_sep: false, dtype: null}
        first_stage_config:
          target: ldm.models.autoencoder.AutoencoderKL
          params:
            embed_dim: 4
            ddconfig: {double_z: true, z_channels: 4, resolution: 64,
                       in_channels: 3, out_ch: 3, ch: 16, ch_mult: [1, 2],
                       num_res_blocks: 1, attn_resolutions: [], dropout: 0.0}
        cond_stage_config:
          target: ldm.modules.encoders.NVS_modules.NVSCLIPEmbedder
          params:
            layer: penultimate
            special_tokens: ["repeat_4_<special-token>"]
            init_text: ["left reference right target pose"]
            cfg_rate: 0.15
            width: 24
            heads: 2
            layers: 2
        lora: {do_lora: true, lora_type: default, lora_rank: 2, lora_scale: 1.0}
        data_config:
          img_size: 32
          cfg: 2.5
          sp_token: "<special-token>"
          repeat_sp_token: 4
          obj_dataset: true
          nviews: 4
        refinement_config: {use_input_refinement: false, only_masked_refine: false}
        save_prompt_only: true
    """
)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("variants")
    rng = np.random.RandomState(0)
    # crossview images + multiview pairs
    image_dict = {}
    for i in range(8):
        d = root / "mega" / "0001" / "imgs"
        d.mkdir(parents=True, exist_ok=True)
        p = d / f"im{i}.jpg"
        cv2.imwrite(str(p), rng.randint(0, 255, (48, 48, 3), np.uint8))
        image_dict[i] = str(p)
    mv_pairs = [{"target": [i], "source": [(i + 1) % 8], "idx": i} for i in range(6)]
    with open(root / "image_dict.pkl", "wb") as f:
        pickle.dump(image_dict, f)
    with open(root / "mv_pairs.pkl", "wb") as f:
        pickle.dump(mv_pairs, f)
    # masks
    (root / "masks").mkdir()
    mask_files = []
    for i in range(2):
        p = root / "masks" / f"m{i}.png"
        m = np.zeros((32, 32), np.uint8)
        m[8:24, 4 * i + 4 : 4 * i + 20] = 255
        cv2.imwrite(str(p), m)
        mask_files.append(str(p))
    (root / "irregular.txt").write_text(mask_files[0])
    (root / "segment.txt").write_text(mask_files[1])
    # multiview test dirs
    for i in range(2):
        d = root / "mvtest" / f"{i:06d}"
        d.mkdir(parents=True)
        for name in ("source", "source_1", "source_2", "source_3", "target"):
            cv2.imwrite(str(d / f"{name}.jpg"), rng.randint(0, 255, (48, 48, 3), np.uint8))
        m = np.zeros((32, 32), np.uint8)
        m[8:24, 8:24] = 255
        cv2.imwrite(str(d / "mask.png"), m)
    # objaverse renders
    for obj in range(3):
        d = root / "objs" / f"obj{obj}"
        d.mkdir(parents=True)
        for v in range(4):
            im = np.zeros((48, 48, 4), np.uint8)
            im[12:36, 12:36, :3] = rng.randint(0, 255, (24, 24, 3))
            im[12:36, 12:36, 3] = 255
            cv2.imwrite(str(d / f"{v:03d}.png"), im)
            th = v * math.pi / 4
            R = np.array([[math.cos(th), -math.sin(th), 0], [math.sin(th), math.cos(th), 0], [0, 0, 1]])
            np.save(str(d / f"{v:03d}.npy"), np.concatenate([R, np.array([[0.0], [0.0], [2.0]])], axis=1))
    (root / "objs_train.txt").write_text("\n".join(f"obj{o}" for o in range(3)))
    (root / "objs_val.txt").write_text("obj0")

    (root / "mv_model.yaml").write_text(MV_MODEL_YAML)
    (root / "nvs_model.yaml").write_text(NVS_MODEL_YAML)
    mv_train = textwrap.dedent(
        f"""
        model_config: '{root}/mv_model.yaml'
        resume_path: null
        image_path: '{root}/image_dict.pkl'
        train_pair: '{root}/mv_pairs.pkl'
        val_image_path: '{root}/mvtest'
        train_mask_path: ['{root}/irregular.txt', '{root}/segment.txt']
        val_mask_path: '{root}/masks'
        cross_view_inpainting: true
        n_sample_per_scene: 4
        batch_size: 1
        logger_freq: 1000
        check_val_every_n_epoch: 1
        max_epochs: 1
        max_steps: 2
        save_top_k: 1
        log_ddim_steps: 2
        val_ddim_steps: 2
        val_batches: 1
        monitor: ssim
        optim_cfg: {{learning_rate: 1.0e-3, weight_decay: 0.01, lr_scheduler: none}}
        """
    )
    (root / "mv_train.yaml").write_text(mv_train)
    nvs_train = textwrap.dedent(
        f"""
        model_config: '{root}/nvs_model.yaml'
        resume_path: null
        datapath: '{root}/objs'
        train_list: '{root}/objs_train.txt'
        val_list: '{root}/objs_val.txt'
        cross_view_inpainting: false
        batch_size: 2
        logger_freq: 1000
        check_val_every_n_epoch: 1
        max_epochs: 1
        max_steps: 2
        save_top_k: 1
        log_ddim_steps: 2
        val_ddim_steps: 2
        val_batches: 1
        monitor: ssim
        optim_cfg: {{learning_rate: 1.0e-3, weight_decay: 0.01, lr_scheduler: none}}
        """
    )
    (root / "nvs_train.yaml").write_text(nvs_train)
    return root


@pytest.mark.slow
def test_multiview_train_smoke(workdir):
    from leftrefill_tpu.cli.train import main

    save = workdir / "ck_mv"
    rc = main(
        [
            "--config_file", str(workdir / "mv_train.yaml"),
            "--exp_name", "mv",
            "--save_path", str(save),
            "--no_restore",
            "--nchip", "2",
        ]
    )
    assert rc == 0
    assert (save / "mv" / "ckpts" / "last").exists()


@pytest.mark.slow
def test_nvs_train_smoke(workdir):
    """NVS training with LoRA + pose conditioning end-to-end."""
    from leftrefill_tpu.cli.train import main

    save = workdir / "ck_nvs"
    rc = main(
        [
            "--config_file", str(workdir / "nvs_train.yaml"),
            "--exp_name", "nvs",
            "--save_path", str(save),
            "--no_restore",
            "--nchip", "2",
        ]
    )
    assert rc == 0
    assert (save / "nvs" / "ckpts" / "last").exists()


@pytest.mark.slow
def test_multiview_eval_cli(workdir):
    """--multiview eval path (test_multiview_inpainting.py equivalent);
    depends on the mv train smoke having created the experiment dir."""
    from leftrefill_tpu.cli.test import main

    exp = workdir / "ck_mv" / "mv"
    assert (exp / "model_config.yaml").exists(), "run after the mv train smoke"
    mo = workdir / "mv_metrics"
    rc = main(
        [
            "--model_path", str(exp),
            "--test_path", str(workdir / "mvtest"),
            "--test_size", "32",
            "--ddim_steps", "2",
            "--cfg", "2.5",
            "--batch_size", "1",
            "--multiview",
            "--output_path", str(workdir / "mv_out"),
            "--metric_output", str(mo),
        ]
    )
    assert rc == 0
    assert glob(str(mo / "*.txt"))
