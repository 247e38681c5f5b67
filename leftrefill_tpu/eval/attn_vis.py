"""Attention visualization: collect per-layer cross-attention maps.

Behavioural reference: the return_attn plumbing through
/root/reference/ldm/models/diffusion/ddim.py:282-300 (per-step CFG-blended
attention scores averaged over the sampling trajectory) and the debug heatmap
dumper multiview_attention.py:208-295.

TPU-native: instead of threading score returns through every module, the
CrossAttention modules ``sow`` head-averaged probabilities into the flax
'intermediates' collection when called with return_attn=True; one
``apply(..., mutable=['intermediates'])`` collects every layer at once.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def collect_attention_maps(model, params: Any, x, t, context) -> dict[str, np.ndarray]:
    """One UNet forward with attention sowing; returns {layer_path: [B,Nq,Nk]}."""
    out, inter = model.apply(
        {"params": params}, x, t, context, return_attn=True, mutable=["intermediates"]
    )
    maps = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        else:  # sow stores a tuple of values
            for i, v in enumerate(node):
                maps["/".join(path)] = np.asarray(v)

    walk(inter.get("intermediates", {}), ())
    return maps


def average_attention_over_steps(step_maps: list[dict[str, np.ndarray]]) -> dict[str, np.ndarray]:
    """ddim.py:298-299: accumulate per-step scores and divide by step count."""
    acc: dict[str, np.ndarray] = {}
    for m in step_maps:
        for k, v in m.items():
            acc[k] = acc.get(k, 0) + v
    return {k: v / len(step_maps) for k, v in acc.items()}


def attention_heatmap(
    attn: np.ndarray, query_hw: tuple[int, int], token_index: int
) -> np.ndarray:
    """[Nq, Nk] map -> [h, w] heatmap of attention onto one context token,
    normalized to [0,1] (the save_attn_vis rendering)."""
    h, w = query_hw
    m = attn[:, token_index].reshape(h, w)
    lo, hi = m.min(), m.max()
    return (m - lo) / max(hi - lo, 1e-8)
