"""Checkpoint IO: orbax two-tier scheme (frozen SD weights + tiny trainable
pytree), prompt-only pruning, torch-checkpoint interop.

Behavioural reference:
- prompt-only checkpoint pruning (keep only non-frozen cond-stage keys):
  /root/reference/inpainting_ldm/ref_inpainting_ldm.py:164-173; the NVS
  variant additionally keeps lora/sep/refinement keys (NVS_ldm.py:418-435)
- restore dance for prompt-only ckpts (merge prompt over freshly loaded SD
  weights, resave full): /root/reference/train_inpainting.py:81-91,115-121
- ModelCheckpoint top-k on val/lpips + last: train_inpainting.py:103-106
- torch/safetensors loading: inpainting_ldm/model.py:9-29

Design: the frozen towers are loaded once (torch ckpt -> convert); only the
trainable leaves are checkpointed frequently (~KBs, matching the reference's
720KB artifacts).  orbax handles the pytree IO; a tiny JSON manifest tracks
best-k by metric.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Callable, Optional

import jax
import numpy as np

Params = Any


def _path_keys(path) -> tuple:
    return tuple(k.key if hasattr(k, "key") else str(getattr(k, "name", k)) for k in path)


def filter_tree(params: Params, predicate: Callable[[tuple], bool]) -> dict:
    """Extract a sub-pytree (as nested dict) of leaves whose path matches."""
    out: dict = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = _path_keys(path)
        if not predicate(keys):
            continue
        node = out
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = leaf
    return out


def prompt_only_filter(keys: tuple) -> bool:
    """ref_inpainting_ldm.py:164-173: only the trainable cond-stage table."""
    return "special_embeddings" in keys


def nvs_prompt_filter(keys: tuple) -> bool:
    """NVS_ldm.py:418-435: prompt + rel-pos + lora + sep + refinement."""
    joined = "/".join(keys)
    return any(
        s in joined
        for s in ("special_embeddings", "rel_pos_model", "lora", "sep_token", "refine")
    )


class CheckpointManager:
    """Simple orbax-backed manager: save(step, tree, metrics), keeps ``last``
    plus top-k by a monitored metric (lower is better by default, matching
    val/lpips monitoring, train_inpainting.py:103-106)."""

    def __init__(
        self,
        directory: str,
        monitor: str = "val/lpips",
        top_k: int = 2,
        lower_is_better: bool = True,
    ):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.monitor = monitor
        self.top_k = top_k
        self.lower_is_better = lower_is_better
        self._ckptr = ocp.StandardCheckpointer()
        self._manifest_path = os.path.join(self.directory, "manifest.json")
        self.manifest = self._load_manifest()

    def _load_manifest(self) -> dict:
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                return json.load(f)
        return {"best": [], "last": None}

    def _write_manifest(self):
        with open(self._manifest_path, "w") as f:
            json.dump(self.manifest, f, indent=2)

    def _save_tree(self, name: str, tree: Params):
        path = os.path.join(self.directory, name)
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, tree)
        self._ckptr.wait_until_finished()

    def save_last(self, step: int, tree: Params):
        self._save_tree("last", tree)
        self.manifest["last"] = {"step": int(step)}
        self._write_manifest()

    def save_best(self, step: int, tree: Params, metrics: dict):
        value = float(metrics[self.monitor])
        name = f"step_{int(step)}"
        self._save_tree(name, tree)
        self.manifest["best"].append({"name": name, "step": int(step), "value": value})
        self.manifest["best"].sort(key=lambda e: e["value"], reverse=not self.lower_is_better)
        while len(self.manifest["best"]) > self.top_k:
            drop = self.manifest["best"].pop()
            p = os.path.join(self.directory, drop["name"])
            if os.path.exists(p):
                shutil.rmtree(p)
        self._write_manifest()

    def restore(self, name: str, target: Optional[Params] = None) -> Params:
        import orbax.checkpoint as ocp

        path = os.path.join(self.directory, name)
        if target is not None:
            return self._ckptr.restore(path, target=target)
        return self._ckptr.restore(path)

    def best_name(self) -> Optional[str]:
        return self.manifest["best"][0]["name"] if self.manifest["best"] else None


def save_pruned(
    manager: CheckpointManager,
    step: int,
    params: Params,
    save_prompt_only: bool,
    metrics: Optional[dict] = None,
    filter_fn: Callable[[tuple], bool] = prompt_only_filter,
):
    """on_save_checkpoint semantics: prune to the trainable subtree when
    save_prompt_only (ref_inpainting_ldm.py:164-173)."""
    tree = filter_tree(params, filter_fn) if save_prompt_only else params
    manager.save_last(step, tree)
    if metrics is not None and manager.monitor in metrics:
        manager.save_best(step, tree, metrics)


def restore_over_base(
    base_params: Params, restored_subtree: dict
) -> tuple[Params, list[str], list[str]]:
    """The prompt-only restore dance (train_inpainting.py:81-91): merge the
    tiny restored subtree over freshly loaded frozen weights."""
    from leftrefill_tpu.convert.torch_to_flax import merge_params

    return merge_params(base_params, restored_subtree)
