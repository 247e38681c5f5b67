"""Runtime helpers: persistent XLA compilation cache + serving adapter store.

The reference has no analogue (torch eager); on TPU the first jit of the
865M-parameter graph costs minutes, so serving restarts must reuse compiled
executables.  ``enable_persistent_compilation_cache`` turns on jax's on-disk
cache keyed by (HLO, compile options, platform) — subsequent process starts
load the executable instead of recompiling.

``LoraAdapterStore`` implements the serving-side "batched LoRA adapter swap"
(CLAUDE.md roadmap 5): named LoRA factor packs merged over frozen base params
(models/lora.py merge semantics == the reference's injected modules at
inference, inpainting_ldm/lora.py:7-131) with a small LRU of merged trees so
consecutive requests for the same adapter pay zero merge cost and the jitted
pipeline never recompiles (parameter shapes are identical across adapters).
"""

from __future__ import annotations

import collections
import os
from typing import Any, Optional

Params = Any

_CACHE_ENABLED = False


def enable_persistent_compilation_cache(cache_dir: Optional[str] = None) -> str:
    """Enable jax's persistent compilation cache (idempotent).  Returns the
    ACTIVE cache directory — on a repeated call with a different path the
    first directory stays in effect and is what is returned."""
    global _CACHE_ENABLED
    import jax

    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "leftrefill_tpu", "xla_cache"
    )
    if not _CACHE_ENABLED:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that took measurable compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _CACHE_ENABLED = True
    return jax.config.jax_compilation_cache_dir


class LoraAdapterStore:
    """Named LoRA adapter packs over one frozen base parameter tree.

    add(name, lora): register factor pack {"path": {"down","up"}}.
    params_for(name | None, scale): merged full tree (LRU-cached, capacity
    ``keep``); None -> the base tree.  All merged trees share shapes/dtypes
    with the base, so a jitted pipeline accepts any of them without
    recompilation — adapter swap costs one merge (or a cache hit).

    int8 serving (W8A8 UNet): int8 kernels cannot take additive LoRA merges,
    so pass ``master_unet`` — the fp/bf16 UNet tree the base was quantized
    from.  params_for then merges into the master and REQUANTIZES the result
    to the base's int8 structure (merge -> ops.quant.quantize_params_like),
    all inside one jitted call; the swap costs one merge+requant pass and the
    merged tree still matches the quant pipeline's shapes/dtypes exactly.
    """

    def __init__(
        self, base_params: Params, keep: int = 2, master_unet: Optional[Params] = None
    ):
        self.base = base_params
        self.keep = keep
        self.master_unet = master_unet
        self._adapters: dict[str, dict] = {}
        self._merged: "collections.OrderedDict[tuple, Params]" = collections.OrderedDict()
        self._merge_fn = None  # lazily-built jitted merge(+requant)

    def add(self, name: str, lora: dict) -> None:
        self._adapters[name] = lora
        # invalidate any cached merge for a re-registered name
        for key in [k for k in self._merged if k[0] == name]:
            del self._merged[key]

    def names(self) -> list[str]:
        return sorted(self._adapters)

    def params_for(self, name: Optional[str] = None, scale: float = 1.0) -> Params:
        if name is None:
            return self.base
        if name not in self._adapters:
            raise KeyError(f"unknown adapter {name!r}; have {self.names()}")
        key = (name, float(scale))
        if key in self._merged:
            self._merged.move_to_end(key)
            return self._merged[key]
        merged = dict(self.base)
        merged["unet"] = self._merge_unet(self._adapters[name], scale)
        self._merged[key] = merged
        while len(self._merged) > self.keep:
            self._merged.popitem(last=False)
        return merged

    def _merge_unet(self, lora: dict, scale: float):
        import jax
        import jax.numpy as jnp

        from leftrefill_tpu.models.lora import merge_lora

        if self._merge_fn is None:
            if self.master_unet is None:
                fn = lambda master, lora_, s: merge_lora(master, lora_, s)
            else:
                from leftrefill_tpu.ops.quant import quantize_params_like

                # the base int8 tree doubles as the quant structure
                # (kernel + kernel_scale siblings mark the quantized sites)
                q_struct = self.base["unet"]
                fn = lambda master, lora_, s: quantize_params_like(
                    q_struct, merge_lora(master, lora_, s)
                )
            self._merge_fn = jax.jit(fn)
        master = self.master_unet if self.master_unet is not None else self.base["unet"]
        return self._merge_fn(master, lora, jnp.float32(scale))
