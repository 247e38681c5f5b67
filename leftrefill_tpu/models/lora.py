"""LoRA as functional parameter-tree transforms (no module mutation).

Behavioural reference: /root/reference/inpainting_ldm/lora.py —
- LoraInjectedLinear (:7-45): y = Wx + scale * up(down(x)), down ~ N(0, 1/r),
  up = 0; LoraInjectedConv2d (:48-131): conv + (same-geometry conv to r chans
  -> 1x1 conv to out)
- target module sets (:130-140): default {CrossAttention, Attention,
  MemoryEfficientCrossAttention, GEGLU} Linears; extended additionally Conv2d
  in ResnetBlocks
- injectors (:228-363) and extract_lora_ups_down (:366-379)

TPU-native design: torch mutates modules in place; here LoRA is algebra on
the parameter pytree.  For a Dense kernel K [in,out], the injected layer is
exactly K' = K + scale * down @ up (down [in,r], up [r,out], dropout_p=0 —
LeftRefill never enables LoRA dropout).  For a Conv kernel [kh,kw,in,out]
with a 1x1 up-conv the delta is einsum('hwir,ro->hwio').  ``merge`` therefore
produces an exact-equivalent parameter tree; gradients w.r.t. (down, up) flow
through the merge, so training matches the reference's module-injection
semantics while staying a pure function for pjit.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

Params = Any

# path predicates matching the reference's target module sets
_ATTN_LEAVES = ("to_q", "to_k", "to_v", "to_out_0")
_GEGLU_LEAVES = ("net_0_proj",)


def default_target(path: tuple[str, ...]) -> bool:
    """Linears inside {CrossAttention, GEGLU} (lora.py:130-134): attention
    projections and the GEGLU input projection."""
    if len(path) < 2 or path[-1] != "kernel":
        return False
    mod = path[-2]
    return mod in _ATTN_LEAVES or mod in _GEGLU_LEAVES


def extended_target(path: tuple[str, ...]) -> bool:
    """default + convs inside ResBlocks (lora.py:136)."""
    if default_target(path):
        return True
    if len(path) < 2 or path[-1] != "kernel":
        return False
    mod = path[-2]
    return mod in ("in_layers_2", "out_layers_3", "skip_connection")


def _iter_kernels(params: Params):
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = tuple(
            k.key if hasattr(k, "key") else str(getattr(k, "name", k)) for k in path
        )
        yield keys, leaf


def init_lora(
    params: Params,
    rank: int = 16,
    target: Callable[[tuple], bool] = default_target,
    key: jax.Array | None = None,
) -> dict:
    """Create LoRA factors for every targeted kernel.  Returns a flat dict
    {"/".join(path): {"down": ..., "up": ...}} (flat keys keep checkpointing
    and optimizer masking trivial)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    out: dict[str, dict] = {}
    for path, leaf in _iter_kernels(params):
        if not target(path):
            continue
        shape = np.shape(leaf)
        key, sub = jax.random.split(key)
        if len(shape) == 2:  # Dense [in, out]
            din, dout = shape
            down = jax.random.normal(sub, (din, rank), jnp.float32) * (1.0 / rank)
            up = jnp.zeros((rank, dout), jnp.float32)
        elif len(shape) == 4:  # Conv [kh, kw, in, out]
            kh, kw, din, dout = shape
            down = jax.random.normal(sub, (kh, kw, din, rank), jnp.float32) * (1.0 / rank)
            up = jnp.zeros((rank, dout), jnp.float32)
        else:
            continue
        out["/".join(path)] = {"down": down, "up": up}
    return out


def merge_lora(params: Params, lora: dict, scale: float = 1.0) -> Params:
    """params' = params + scale * (down ∘ up) at every LoRA site — exact
    equivalent of the injected modules at dropout 0."""
    if not lora:
        return params

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    new_leaves = []
    for path, leaf in flat:
        keys = "/".join(
            k.key if hasattr(k, "key") else str(getattr(k, "name", k)) for k in path
        )
        if keys in lora:
            down = lora[keys]["down"]
            up = lora[keys]["up"]
            if down.ndim == 2:
                delta = down @ up
            else:
                delta = jnp.einsum("hwir,ro->hwio", down, up)
            leaf = leaf + scale * delta.astype(leaf.dtype)
        new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def extract_lora(lora: dict, scale: float = 1.0) -> list[tuple[jax.Array, jax.Array]]:
    """extract_lora_ups_down parity (lora.py:366-379): [(up*scale, down)]."""
    return [(v["up"] * scale, v["down"]) for v in lora.values()]


def num_lora_params(lora: dict) -> int:
    return sum(int(np.prod(np.shape(v["down"])) + np.prod(np.shape(v["up"]))) for v in lora.values())
