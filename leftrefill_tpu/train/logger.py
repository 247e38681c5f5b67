"""Training observability: image grids, metrics, token drift, profiling.

Behavioural reference:
- InpaintingLogger (grid jpgs every batch_frequency + per-token embedding
  drift L2 norms): /root/reference/inpainting_ldm/logger.py:23-124
- TestTubeLogger metric stream: train_inpainting.py:93-98 (here: JSONL —
  TensorBoard isn't in the baked env; the format is trivially convertible)
- LearningRateMonitor: train_inpainting.py:107

Plus first-class profiling hooks (SURVEY §5: the reference has none wired):
jax.profiler traces + per-step wall times.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Optional

import numpy as np
from PIL import Image


def to_uint8(img: np.ndarray) -> np.ndarray:
    """[-1,1] float -> uint8."""
    return np.clip((np.asarray(img, np.float32) + 1.0) * 127.5, 0, 255).astype(np.uint8)


def make_grid(images: dict[str, np.ndarray], max_images: int = 4) -> np.ndarray:
    """Horizontal grid per key, stacked vertically per sample (the logger's
    jpg layout, inpainting_ldm/logger.py:43-71).  Each value [B,H,W,C]."""
    rows = []
    n = min(max_images, next(iter(images.values())).shape[0])
    for i in range(n):
        row = np.concatenate(
            [
                to_uint8(np.broadcast_to(v[i], v[i].shape[:2] + (3,)) if v[i].shape[-1] == 1 else v[i])
                for v in images.values()
            ],
            axis=1,
        )
        rows.append(row)
    return np.concatenate(rows, axis=0)


class MetricLogger:
    """Append-only JSONL metric stream + stdout echo."""

    def __init__(self, save_dir: str, echo_every: int = 50):
        os.makedirs(save_dir, exist_ok=True)
        self.path = os.path.join(save_dir, "metrics.jsonl")
        self.echo_every = echo_every
        self._n = 0

    def log(self, step: int, metrics: dict[str, Any]):
        rec = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            rec[k] = float(v) if np.isscalar(v) or np.ndim(v) == 0 else v
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        self._n += 1
        if self._n % self.echo_every == 0:
            print(f"[step {step}] " + " ".join(f"{k}={rec[k]:.5g}" for k in metrics))


class ImageLogger:
    """Save a sample grid every ``batch_frequency`` steps
    (inpainting_ldm/logger.py:43-71)."""

    def __init__(self, save_dir: str, batch_frequency: int = 200, max_images: int = 4):
        self.save_dir = save_dir
        self.batch_frequency = batch_frequency
        self.max_images = max_images
        os.makedirs(save_dir, exist_ok=True)

    def should_log(self, step: int) -> bool:
        return step % self.batch_frequency == 0

    def log(self, step: int, epoch: int, images: dict[str, np.ndarray], split: str = "train"):
        grid = make_grid(images, self.max_images)
        name = f"gs-{step:06}_e-{epoch:06}_{split}.jpg"
        Image.fromarray(grid).save(os.path.join(self.save_dir, name))


class TokenDriftLogger:
    """Per-special-token embedding drift L2 vs the initial table
    (inpainting_ldm/logger.py:114-123)."""

    def __init__(self, initial_table: np.ndarray):
        self.initial = np.asarray(initial_table, np.float32).copy()

    def drift(self, current_table: np.ndarray) -> dict[str, float]:
        cur = np.asarray(current_table, np.float32)
        per_token = np.linalg.norm(cur - self.initial, axis=-1)
        return {
            "token_drift/mean": float(per_token.mean()),
            "token_drift/max": float(per_token.max()),
        }


class StepTimer:
    """Per-step wall-time EMA + optional jax.profiler trace window."""

    def __init__(self, trace_dir: Optional[str] = None, trace_steps: tuple[int, int] = (10, 13)):
        self.trace_dir = trace_dir
        self.trace_steps = trace_steps
        self._t0 = None
        self.ema = None
        self._tracing = False

    def start(self, step: int):
        if self.trace_dir and step == self.trace_steps[0]:
            import jax

            jax.profiler.start_trace(self.trace_dir)
            self._tracing = True
        self._t0 = time.time()

    def stop(self, step: int) -> float:
        dt = time.time() - self._t0
        self.ema = dt if self.ema is None else 0.9 * self.ema + 0.1 * dt
        if self._tracing and step >= self.trace_steps[1]:
            import jax

            jax.profiler.stop_trace()
            self._tracing = False
        return dt
