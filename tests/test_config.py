"""Config registry tests: the actual reference YAMLs must load unchanged
(reference: ldm/util.py:71-86, configs/ref_inpainting.yaml)."""

import os

import pytest

from leftrefill_tpu.config import (
    build_model_from_config,
    instantiate_from_config,
    load_yaml,
)

REPO_ROOT = os.path.join(os.path.dirname(__file__), "..")
REF_CFG = os.path.join(REPO_ROOT, "configs", "ref_inpainting.yaml")
REF_MODEL_CFG = "/root/reference/check_points/ref_guided_inpainting/model_config.yaml"
UPSTREAM_CFG = "/root/reference/configs/ref_inpainting.yaml"


def test_unknown_target_raises():
    with pytest.raises(KeyError):
        instantiate_from_config({"target": "nope.nope.Nope"})
    with pytest.raises(KeyError):
        instantiate_from_config({"params": {}})


def test_repo_yaml_builds_bundle():
    bundle = build_model_from_config(REF_CFG)
    m = bundle.model
    # SD2-inpainting structure from the YAML
    assert m.unet.in_channels == 9
    assert m.unet.model_channels == 320
    assert m.unet.context_dim == 1024
    assert tuple(m.unet.channel_mult) == (1, 2, 4, 4)
    assert m.vae.ddconfig.ch == 128
    assert m.scale_factor == 0.18215
    assert m.conditioning_key == "hybrid"
    assert m.schedule.num_timesteps == 1000
    # 50 expanded special tokens with the repeat_50_ rule
    assert len(bundle.cond_bundle.special_tokens) == 50
    assert bundle.cond_bundle.special_tokens[0] == "<special-token0>"
    assert bundle.save_prompt_only is True
    assert bundle.data_config["repeat_sp_token"] == 50


@pytest.mark.skipif(not os.path.exists(REF_MODEL_CFG), reason="ckpt config absent")
def test_shipped_model_config_builds():
    bundle = build_model_from_config(REF_MODEL_CFG)
    assert bundle.model.unet.in_channels == 9
    assert len(bundle.cond_bundle.special_tokens) == 50


@pytest.mark.skipif(
    not os.path.exists(UPSTREAM_CFG), reason="reference checkout absent"
)
@pytest.mark.parametrize(
    "name",
    ["ref_inpainting", "multiview_ref_inpainting", "novel_view_synthesis"],
)
def test_repo_configs_match_reference(name):
    """The shipped configs must stay semantically identical to the upstream
    model YAMLs (same model params tree, ignoring comments/ordering)."""
    repo = load_yaml(os.path.join(REPO_ROOT, "configs", f"{name}.yaml"))
    ref = load_yaml(f"/root/reference/configs/{name}.yaml")
    assert repo["model"]["target"] == ref["model"]["target"]

    def norm(tree):
        if isinstance(tree, dict):
            return {k: norm(v) for k, v in tree.items()}
        if isinstance(tree, list):
            return [norm(v) for v in tree]
        return tree

    assert norm(repo["model"]["params"]) == norm(ref["model"]["params"])
