"""Torch checkpoint -> Flax parameter pytree converter.

Behavioural reference:
- checkpoint layout: the SD2-inpainting state_dict loaded by
  /root/reference/train_inpainting.py:16-43 (torch_init_model) with keys
  ``model.diffusion_model.*`` (UNet), ``first_stage_model.*`` (VAE),
  ``cond_stage_model.model.*`` + ``cond_stage_model.special_embeddings.*``
  (CLIP + prompt table), plus schedule buffers (betas, alphas_cumprod, ...)
  that we recompute and therefore skip.
- torch/safetensors loading: /root/reference/inpainting_ldm/model.py:9-29 and
  the pure-python safetensors reader safe_open.py:46-68 (reimplemented here
  from the safetensors format spec).

Layout rules (torch -> flax):
- conv  weight OIHW -> kernel HWIO (transpose 2,3,1,0)
- linear weight [out,in] -> kernel [in,out] (transpose)
- GroupNorm/LayerNorm weight -> scale
- embeddings (token/special/positional) kept row-major as-is
- name segments: '.' separators fold into the flax module names that mirror
  torch keys ('input_blocks.1.0.in_layers.0' -> input_blocks_1_0/in_layers_0)
"""

from __future__ import annotations

import io
import json
import re
import struct
from typing import Any, Callable, Iterable, Mapping

import numpy as np

# ---------------------------------------------------------------------------
# loading

_SAFETENSORS_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "BF16": None,  # handled specially
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}


def load_safetensors(path: str) -> dict[str, np.ndarray]:
    """Pure-python/numpy safetensors reader (format: u64 header len, JSON
    header with dtype/shape/offset per tensor, raw little-endian buffer)."""
    out: dict[str, np.ndarray] = {}
    with open(path, "rb") as f:
        (header_len,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(header_len))
        data = f.read()
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        start, end = meta["data_offsets"]
        raw = data[start:end]
        shape = meta["shape"]
        if meta["dtype"] == "BF16":
            u16 = np.frombuffer(raw, dtype=np.uint16)
            arr = (u16.astype(np.uint32) << 16).view(np.float32)
        else:
            arr = np.frombuffer(raw, dtype=_SAFETENSORS_DTYPES[meta["dtype"]])
        out[name] = arr.reshape(shape).copy()
    return out


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a .ckpt/.pt/.safetensors into numpy arrays (host-side, fp32)."""
    if path.endswith(".safetensors"):
        return load_safetensors(path)
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().to(torch.float32).numpy()
    return out


# ---------------------------------------------------------------------------
# key mapping

_NORM_NAMES = {
    # UNet / transformer norms
    "in_layers_0", "out_layers_0", "norm", "norm1", "norm2", "norm3",
    "out_0", "ln_1", "ln_2", "ln_final",
    # VAE norms
    "norm_out",
}

_EMBED_LEAF = {"token_embedding", "special_embeddings", "positional_embedding"}


def _fold_name(segments: list[str]) -> list[str]:
    """Fold numeric segments into their parent ('input_blocks','1','0') ->
    'input_blocks_1_0', matching the flax module naming scheme."""
    out: list[str] = []
    for seg in segments:
        if seg.isdigit() and out:
            out[-1] = f"{out[-1]}_{seg}"
        else:
            out.append(seg)
    return out


def map_unet_key(key: str) -> list[str] | None:
    """'input_blocks.1.0.in_layers.2.weight' ->
    ['input_blocks_1_0', 'in_layers_2', <leaf>]."""
    parts = key.split(".")
    if parts[0] == "sep_token":  # NVS ParameterDict 'sep_token.9' etc.
        return [f"sep_token_{parts[1]}"]
    leaf = parts[-1]
    segs = _fold_name(parts[:-1])
    # torch Sequential inside to_out / ff.net are already numeric-folded:
    # to_out.0 -> to_out_0 ; ff.net.0.proj -> ff/net_0/proj -> ff/net_0_proj
    segs = _merge_proj(segs)
    return segs + [leaf]


def _merge_proj(segs: list[str]) -> list[str]:
    # ff/net_0/proj was folded to [... , 'ff', 'net_0', 'proj'] -> net_0_proj
    out = []
    for s in segs:
        if s == "proj" and out and out[-1].startswith("net_"):
            out[-1] = f"{out[-1]}_proj"
        else:
            out.append(s)
    return out


def map_vae_key(key: str) -> list[str] | None:
    """'encoder.down.0.block.1.norm1.weight' ->
    ['encoder', 'down_0_block_1', 'norm1', <leaf>].  The flax VAE flattens
    down/up/block/attn/mid into single-level names."""
    parts = key.split(".")
    leaf = parts[-1]
    body = parts[:-1]
    segs: list[str] = []
    i = 0
    while i < len(body):
        s = body[i]
        if s in ("down", "up") and i + 1 < len(body) and body[i + 1].isdigit():
            lvl = body[i + 1]
            nxt = body[i + 2] if i + 2 < len(body) else ""
            if nxt in ("block", "attn") and i + 3 < len(body) and body[i + 3].isdigit():
                segs.append(f"{s}_{lvl}_{nxt}_{body[i + 3]}")
                i += 4
            elif nxt == "downsample" or nxt == "upsample":
                segs.append(f"{s}_{lvl}_{nxt}")
                i += 3
            else:
                segs.append(f"{s}_{lvl}")
                i += 2
        elif s == "mid":
            segs.append(f"mid_{body[i + 1]}")
            i += 2
        else:
            segs.append(s)
            i += 1
    return segs + [leaf]


def map_refinement_key(key: str) -> list[str] | None:
    """NVS refinement CNN (NVS_ldm.py:124-146): torch Sequential indices ->
    conv_N / norm_N names; returns None for non-refinement keys."""
    parts = key.split(".")
    if parts[0] == "refinement_alpha":
        return ["refinement_alpha"]
    if parts[0] != "refinement_model":
        return None
    idx, leaf = parts[1], parts[2]
    conv_ids = {"0", "2", "5", "8", "11", "14", "17"}
    name = f"conv_{idx}" if idx in conv_ids else f"norm_{idx}"
    return [name, leaf]


def map_clip_key(key: str) -> list[str] | None:
    """cond_stage_model sub-keys (after prefix strip)."""
    if key == "special_embeddings.weight":
        return ["special_embeddings"]
    if key.startswith("rel_pos_model."):
        # 'rel_pos_model.mlp1.0.weight' -> rel_pos_model/mlp1_0/<leaf>
        parts = key.split(".")
        return ["rel_pos_model", f"{parts[1]}_{parts[2]}", parts[3]]
    if key == "model.token_embedding.weight":
        return ["token_embedding"]
    if key == "model.positional_embedding":
        return ["model", "positional_embedding"]
    if key.startswith("model.ln_final."):
        return ["model", "ln_final", key.split(".")[-1]]
    m = re.match(r"model\.transformer\.resblocks\.(\d+)\.(.+)", key)
    if m:
        idx, rest = m.group(1), m.group(2)
        parts = rest.split(".")
        if parts[0] == "attn":
            if parts[1] in ("in_proj_weight", "in_proj_bias"):
                leaf = "weight" if parts[1].endswith("weight") else "bias"
                return ["model", f"resblocks_{idx}", "attn_in_proj", leaf]
            if parts[1] == "out_proj":
                return ["model", f"resblocks_{idx}", "attn_out_proj", parts[2]]
        if parts[0] == "mlp":
            return ["model", f"resblocks_{idx}", f"mlp_{parts[1]}", parts[2]]
        if parts[0] in ("ln_1", "ln_2"):
            return ["model", f"resblocks_{idx}", parts[0], parts[1]]
    # text_projection / logit_scale / attn_mask: unused by the embedder
    return None

# buffers recomputed by DiffusionSchedule -> skip on load
_SKIP_PATTERNS = (
    "betas", "alphas_cumprod", "alphas_cumprod_prev", "sqrt_alphas_cumprod",
    "sqrt_one_minus_alphas_cumprod", "log_one_minus_alphas_cumprod",
    "sqrt_recip_alphas_cumprod", "sqrt_recipm1_alphas_cumprod",
    "posterior_variance", "posterior_log_variance_clipped",
    "posterior_mean_coef1", "posterior_mean_coef2", "lvlb_weights", "logvar",
    "cond_ids",
)


def _leaf_transform(path: list[str], arr: np.ndarray) -> tuple[list[str], np.ndarray]:
    """Rename the torch leaf + fix the layout for flax."""
    *mods, leaf = path
    last_mod = mods[-1] if mods else ""
    if last_mod in _EMBED_LEAF or leaf in _EMBED_LEAF:
        # embeddings: row-major as-is; path may or may not carry '.weight'
        if leaf == "weight":
            return mods, arr
        return path, arr
    if leaf == "weight":
        if arr.ndim == 4:  # conv OIHW -> HWIO
            return mods + ["kernel"], arr.transpose(2, 3, 1, 0)
        if arr.ndim == 2:  # linear [out,in] -> [in,out]
            return mods + ["kernel"], arr.T
        if arr.ndim == 1:  # norm scale
            return mods + ["scale"], arr
    if leaf == "bias":
        return mods + ["bias"], arr
    return path, arr


def convert_state_dict(
    sd: Mapping[str, np.ndarray],
) -> tuple[dict[str, Any], list[str]]:
    """Full LeftRefill checkpoint -> {"unet":…, "vae":…, "cond":…} pytree.
    Returns (params, skipped_keys)."""
    params: dict[str, Any] = {}
    skipped: list[str] = []

    def insert(root_key: str, path: list[str], arr: np.ndarray):
        node = params.setdefault(root_key, {})
        for seg in path[:-1]:
            node = node.setdefault(seg, {})
        node[path[-1]] = arr

    for key, arr in sd.items():
        if any(key == p or key.startswith("model_ema.") for p in _SKIP_PATTERNS) or key.startswith("model_ema."):
            skipped.append(key)
            continue
        if key.startswith("model.diffusion_model."):
            sub = key[len("model.diffusion_model."):]
            path = map_unet_key(sub)
            root = "unet"
        elif key.startswith("first_stage_model."):
            sub = key[len("first_stage_model."):]
            path = map_vae_key(sub)
            root = "vae"
        elif key.startswith("cond_stage_model."):
            sub = key[len("cond_stage_model."):]
            path = map_clip_key(sub)
            root = "cond"
        elif key.startswith(("refinement_model.", "refinement_alpha")):
            path = map_refinement_key(key)
            root = "refine"
        else:
            skipped.append(key)
            continue
        if path is None:
            skipped.append(key)
            continue
        path, arr = _leaf_transform(path, arr)
        nd = np.ndim(arr)
        arr = np.ascontiguousarray(arr)
        if nd == 0:
            # np.ascontiguousarray promotes 0-d arrays to (1,); keep scalars
            # scalar (e.g. refinement_alpha, NVS_ldm.py:148)
            arr = arr.reshape(())
        insert(root, path, arr)
    return params, skipped


def merge_params(base: dict, loaded: dict, path: str = "") -> tuple[dict, list[str], list[str]]:
    """Non-strict recursive merge (torch_init_model semantics,
    train_inpainting.py:16-43): loaded leaves overwrite base where names AND
    shapes match; returns (merged, missing_in_loaded, unexpected)."""
    missing: list[str] = []
    unexpected: list[str] = []

    def rec(b, l, p):
        out = {}
        for k, v in b.items():
            q = f"{p}/{k}"
            if isinstance(v, dict):
                lv = l.get(k, {}) if isinstance(l, dict) else {}
                out[k] = rec(v, lv, q)
            else:
                lv = l.get(k) if isinstance(l, dict) else None
                if lv is None:
                    missing.append(q)
                    out[k] = v
                elif tuple(np.shape(lv)) != tuple(np.shape(v)):
                    missing.append(f"{q} (shape {np.shape(lv)} != {np.shape(v)})")
                    out[k] = v
                else:
                    out[k] = np.asarray(lv, dtype=np.asarray(v).dtype)
        if isinstance(l, dict):
            for k in l:
                if k not in b:
                    unexpected.append(f"{p}/{k}")
        return out

    merged = rec(base, loaded, path)
    return merged, missing, unexpected


def make_it_fit(old_param: np.ndarray, new_shape: tuple[int, ...]) -> np.ndarray:
    """Channel-tiling restore for shape-mismatched weights
    (ddpm.py:231-273 ``make_it_fit``): cyclically tile the first two axes and
    normalize the second axis by its reuse count.  NOTE: axis convention here
    is the *flax* layout — for conv kernels HWIO the channel axes are the last
    two, so callers pass the torch-layout array BEFORE transposition."""
    old_shape = old_param.shape
    assert len(old_shape) == len(new_shape)
    if len(new_shape) > 2:
        assert tuple(new_shape[2:]) == tuple(old_shape[2:])
    if tuple(new_shape) == tuple(old_shape):
        return old_param
    new_param = np.zeros(new_shape, dtype=old_param.dtype)
    if len(new_shape) == 1:
        for i in range(new_shape[0]):
            new_param[i] = old_param[i % old_shape[0]]
        return new_param
    for i in range(new_shape[0]):
        for j in range(new_shape[1]):
            new_param[i, j] = old_param[i % old_shape[0], j % old_shape[1]]
    n_used_old = np.ones(old_shape[1])
    for j in range(new_shape[1]):
        n_used_old[j % old_shape[1]] += 1
    n_used_new = np.zeros(new_shape[1])
    for j in range(new_shape[1]):
        n_used_new[j] = n_used_old[j % old_shape[1]]
    n_used_new = n_used_new[None, :]
    while n_used_new.ndim < len(new_shape):
        n_used_new = n_used_new[..., None]
    return new_param / n_used_new


def zero_extend_input_conv(kernel: np.ndarray, new_in: int) -> np.ndarray:
    """finetune_keys channel growth (ddpm.py:1542-1570): restoring a 4-channel
    SD ckpt into the 9-channel inpaint UNet zero-fills the new input channels.
    kernel: HWIO."""
    h, w, old_in, out = kernel.shape
    if old_in == new_in:
        return kernel
    grown = np.zeros((h, w, new_in, out), dtype=kernel.dtype)
    grown[:, :, :old_in] = kernel
    return grown
