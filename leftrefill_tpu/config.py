"""Config system: reference-compatible ``target:``/``params:`` YAML loading.

Behavioural reference: /root/reference/ldm/util.py:71-86
(instantiate_from_config / get_obj_from_str) and the model configs under
/root/reference/configs/*.yaml + check_points/*/model_config.yaml.

Instead of dotted-path reflection into torch classes, a REGISTRY maps the
reference's ``target`` strings to builder functions that produce the
corresponding TPU-native objects.  Existing LeftRefill YAMLs load unchanged;
unknown targets raise with the available choices.

``build_model_from_config`` assembles the full LeftRefillModel bundle +
host-side assets (tokenizer, init texts) from a model YAML.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Sequence

import jax.numpy as jnp
import numpy as np
import yaml

from leftrefill_tpu.diffusion.core import LeftRefillModel
from leftrefill_tpu.diffusion.schedules import DiffusionSchedule
from leftrefill_tpu.models.autoencoder import AutoencoderKL, DDConfig
from leftrefill_tpu.models.clip import PromptCLIPEmbedder, build_prompt_tokenizer
from leftrefill_tpu.models.unet import UNetModel

REGISTRY: dict[str, Callable[..., Any]] = {}


def register(*targets: str):
    def deco(fn):
        for t in targets:
            REGISTRY[t] = fn
        return fn

    return deco


def instantiate_from_config(config: dict, **extra) -> Any:
    """ldm/util.py:71-78 semantics: {'target': dotted.path, 'params': {...}}."""
    if "target" not in config:
        if config in ("__is_first_stage__", "__is_unconditional__"):
            return None
        raise KeyError("Expected key `target` to instantiate.")
    target = config["target"]
    if target not in REGISTRY:
        raise KeyError(
            f"Unknown target '{target}'. Registered: {sorted(REGISTRY)}"
        )
    params = dict(config.get("params", {}))
    params.update(extra)
    return REGISTRY[target](**params)


def load_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


# ---------------------------------------------------------------------------
# builders

DTYPE = jnp.bfloat16  # compute dtype for the frozen towers on TPU


@register("ldm.modules.diffusionmodules.multiview_unet.MultiViewUnetModel")
def build_multiview_unet(view_num=2, concat_target=False, no_rearrange_selfattn=False, **kwargs):
    from leftrefill_tpu.models.multiview import MultiViewUnetModel

    base = build_unet(**kwargs)
    return MultiViewUnetModel(
        view_num=view_num,
        concat_target=concat_target,
        no_rearrange_selfattn=no_rearrange_selfattn,
        **{
            f: getattr(base, f)
            for f in (
                "in_channels", "model_channels", "out_channels", "num_res_blocks",
                "attention_resolutions", "channel_mult", "num_heads",
                "num_head_channels", "use_spatial_transformer", "transformer_depth",
                "context_dim", "use_linear_in_transformer", "dtype",
            )
        },
    )


@register(
    "ldm.modules.diffusionmodules.openaimodel.UNetModel",
)
def build_unet(
    image_size=32,
    in_channels=9,
    out_channels=4,
    model_channels=320,
    attention_resolutions=(4, 2, 1),
    num_res_blocks=2,
    channel_mult=(1, 2, 4, 4),
    num_heads=-1,
    num_head_channels=64,
    use_spatial_transformer=True,
    use_linear_in_transformer=True,
    transformer_depth=1,
    context_dim=1024,
    use_checkpoint=True,
    legacy=False,
    dtype=None,
    use_sep=None,
    **kwargs,
) -> UNetModel:
    del image_size, use_checkpoint, legacy, kwargs  # unused / training-only
    if use_sep is not None:
        # NVS configs pass use_sep on the plain UNetModel target
        # (novel_view_synthesis.yaml:37); they need the NVSUnetModel class
        # for the separator columns and the c_input residual.
        from leftrefill_tpu.models.nvs import NVSUnetModel

        cls = NVSUnetModel
        extra = dict(use_sep=bool(use_sep))
    else:
        cls = UNetModel
        extra = {}
    return cls(
        in_channels=in_channels,
        model_channels=model_channels,
        out_channels=out_channels,
        num_res_blocks=num_res_blocks,
        attention_resolutions=tuple(attention_resolutions),
        channel_mult=tuple(channel_mult),
        num_heads=num_heads,
        num_head_channels=num_head_channels,
        use_spatial_transformer=use_spatial_transformer,
        transformer_depth=transformer_depth,
        context_dim=context_dim,
        use_linear_in_transformer=use_linear_in_transformer,
        dtype=dtype or DTYPE,
        **extra,
    )


@register("ldm.modules.encoders.NVS_modules.NVSCLIPEmbedder")
def build_nvs_clip(
    freeze=True,
    layer="penultimate",
    special_tokens=("<left>", "<right>"),
    init_text=None,
    tokenwise_init=False,
    deep_prompt=False,
    cross_attn_layers=16,
    view_prompt=False,
    view_num=None,
    view_token_len=1,
    pos_strengthen=False,
    cfg_rate=0.0,
    bpe_path=None,
    dtype=None,
    width=1024,
    heads=16,
    layers=24,
    vocab_size=49408,
    **kwargs,
) -> "CondStageBundle":
    del freeze, kwargs
    from leftrefill_tpu.models.nvs import NVSCLIPEmbedder

    tok, sp, init = build_prompt_tokenizer(
        list(special_tokens),
        init_text,
        deep_prompt=deep_prompt,
        cross_attn_layers=cross_attn_layers,
        bpe_path=bpe_path,
    )
    if view_prompt and view_num is not None:
        view_tokens = [
            f"<view_direct-{j}-{l}" for j in range(view_num) for l in range(view_token_len)
        ]
        tok, _, _ = build_prompt_tokenizer(sp + view_tokens, None, bpe_path=bpe_path)
        sp = sp + view_tokens
    module = NVSCLIPEmbedder(
        layer=layer,
        num_special_tokens=len(sp),
        deep_prompt=deep_prompt,
        cross_attn_layers=cross_attn_layers,
        pos_strengthen=pos_strengthen,
        cfg_rate=cfg_rate,
        width=width,
        heads=heads,
        layers=layers,
        vocab_size=vocab_size,
        dtype=dtype or DTYPE,
    )
    return CondStageBundle(
        module=module,
        tokenizer=tok,
        special_tokens=sp,
        init_text=init,
        tokenwise_init=tokenwise_init,
    )


@register("ldm.models.autoencoder.AutoencoderKL")
def build_vae(embed_dim=4, ddconfig=None, lossconfig=None, monitor=None, dtype=None, **kwargs) -> AutoencoderKL:
    del lossconfig, monitor, kwargs
    dd = ddconfig or {}
    cfg = DDConfig(
        double_z=dd.get("double_z", True),
        z_channels=dd.get("z_channels", 4),
        resolution=dd.get("resolution", 256),
        in_channels=dd.get("in_channels", 3),
        out_ch=dd.get("out_ch", 3),
        ch=dd.get("ch", 128),
        ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
        num_res_blocks=dd.get("num_res_blocks", 2),
        attn_resolutions=tuple(dd.get("attn_resolutions", ())),
        dropout=dd.get("dropout", 0.0),
    )
    return AutoencoderKL(ddconfig=cfg, embed_dim=embed_dim, dtype=dtype or DTYPE)


@dataclasses.dataclass
class CondStageBundle:
    """Embedder module + host-side tokenizer + expansion results."""

    module: PromptCLIPEmbedder
    tokenizer: Any
    special_tokens: list[str]
    init_text: list[str] | None
    tokenwise_init: bool = False


@register(
    "ldm.modules.encoders.Refill_modules.PromptCLIPEmbedder",
    # the multiview config points at a module absent from the reference repo;
    # the renamed survivor is multiview_Refill_modules (SURVEY §2.6)
    "ldm.modules.encoders.cyn_mod_PGIC_modules.PromptCLIPEmbedder",
    "ldm.modules.encoders.multiview_Refill_modules.PromptCLIPEmbedder",
)
def build_prompt_clip(
    freeze=True,
    layer="penultimate",
    special_tokens=("<left>", "<right>"),
    init_text=None,
    tokenwise_init=False,
    deep_prompt=False,
    cross_attn_layers=16,
    view_num=None,
    view_token_len=None,
    bpe_path=None,
    dtype=None,
    width=1024,
    heads=16,
    layers=24,
    vocab_size=49408,
    **kwargs,
) -> CondStageBundle:
    del freeze, kwargs
    view_tokens = []
    if view_num is not None and view_token_len is not None:
        # multiview view prompts '<view_direct-j-l' (note: no closing '>',
        # replicated faithfully — multiview_Refill_modules.py:136-141)
        view_tokens = [
            f"<view_direct-{j}-{l}"
            for j in range(view_num)
            for l in range(view_token_len)
        ]
    tok, sp, init = build_prompt_tokenizer(
        list(special_tokens),
        init_text,
        deep_prompt=deep_prompt,
        cross_attn_layers=cross_attn_layers,
        bpe_path=bpe_path,
    )
    if view_tokens:
        # append view tokens to the tokenizer's special table; their init
        # sentence is hardcoded in the reference
        # (multiview_Refill_modules.py:136-141)
        view_init = (
            "The whole image is splited into two parts with the same size, "
            "they share the same scene/landmark captured with different "
            "viewpoints and times"
        )
        tok, _, _ = build_prompt_tokenizer(
            sp + view_tokens, None, deep_prompt=False, bpe_path=bpe_path
        )
        sp = sp + view_tokens
        if init is not None:
            init = init + [view_init] * len(view_tokens)
    module = PromptCLIPEmbedder(
        layer=layer,
        num_special_tokens=len(sp) if not deep_prompt else len(sp) // cross_attn_layers,
        deep_prompt=deep_prompt,
        cross_attn_layers=cross_attn_layers,
        width=width,
        heads=heads,
        layers=layers,
        vocab_size=vocab_size,
        dtype=dtype or DTYPE,
    )
    return CondStageBundle(
        module=module,
        tokenizer=tok,
        special_tokens=sp,
        init_text=init,
        tokenwise_init=tokenwise_init,
    )


@dataclasses.dataclass
class ModelBundle:
    """Everything built from a model YAML: the functional model + host assets."""

    model: LeftRefillModel
    cond_bundle: CondStageBundle
    data_config: dict
    save_prompt_only: bool
    task_target: str
    raw_config: dict
    lora_config: dict = dataclasses.field(default_factory=dict)
    refinement_config: dict = dataclasses.field(default_factory=dict)
    view_num: int = 1
    concat_target: bool = False
    reduced_loss: bool = False


_TASK_TARGETS = {
    "inpainting_ldm.ref_inpainting_ldm.RefInpaintLDM",
    "inpainting_ldm.multiview_ref_inpainting_ldm.RefInpaintLDM",
    "inpainting_ldm.NVS_ldm.NVSLDM",
}


def build_model_from_config(config: dict | str, dtype=None) -> ModelBundle:
    """Assemble the LeftRefillModel bundle from a reference model YAML
    (configs/ref_inpainting.yaml layout)."""
    if isinstance(config, str):
        config = load_yaml(config)
    mc = config["model"]
    target = mc["target"]
    if target not in _TASK_TARGETS:
        raise KeyError(f"Unknown task model target {target}")
    p = mc["params"]

    unet = instantiate_from_config(p["unet_config"], dtype=dtype)
    vae = instantiate_from_config(p["first_stage_config"], dtype=dtype)
    cond = instantiate_from_config(p["cond_stage_config"], dtype=dtype)

    schedule = DiffusionSchedule.create(
        timesteps=p.get("timesteps", 1000),
        beta_schedule=p.get("beta_schedule", "linear"),
        linear_start=p.get("linear_start", 1e-4),
        linear_end=p.get("linear_end", 2e-2),
        parameterization=p.get("parameterization", "eps"),
    )
    model = LeftRefillModel(
        unet=unet,
        vae=vae,
        cond_model=cond.module,
        schedule=schedule,
        scale_factor=p.get("scale_factor", 0.18215),
        conditioning_key=p.get("conditioning_key", "hybrid"),
        parameterization=p.get("parameterization", "eps"),
    )
    return ModelBundle(
        model=model,
        cond_bundle=cond,
        data_config=p.get("data_config", {}),
        save_prompt_only=p.get("save_prompt_only", False),
        task_target=target,
        raw_config=config,
        lora_config=p.get("lora", {"do_lora": False}),
        refinement_config=p.get(
            "refinement_config", {"use_input_refinement": False, "only_masked_refine": False}
        ),
        view_num=p.get("view_num", 1),
        concat_target=p.get("concat_target", False),
        reduced_loss=p.get("reduced_loss", False),
    )
