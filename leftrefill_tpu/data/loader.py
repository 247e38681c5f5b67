"""Host-side input pipeline: collation, tokenization, threaded prefetch.

The reference uses torch DataLoader with 8 CPU workers + BalancedRandomSampler
(ref_inpainting_ldm.py:99-117).  TPU-native equivalent: a thread-pool loader
producing numpy batches (images stay NHWC float32; text is tokenized host-side
into [B, 77] int32), with double-buffered prefetch so host IO overlaps device
steps.  Per-host sharding comes from BalancedRandomSampler's rank split.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterable, Iterator, Optional, Sequence

import numpy as np

from leftrefill_tpu.models.tokenizer import SimpleTokenizer


def tokenize_txt(tokenizer: SimpleTokenizer, txt) -> np.ndarray:
    """txt may be a string, a list of per-layer strings (deep prompt) or a
    list of per-view strings (multi-view); returns [77], [L,77] or [V,77]."""
    if isinstance(txt, str):
        return tokenizer.tokenize(txt)[0]
    return tokenizer.tokenize(list(txt))


def collate(items: Sequence[dict], tokenizer: Optional[SimpleTokenizer] = None) -> dict:
    """Stack dataset dicts into one numpy batch; 'txt' becomes 'tokens'."""
    out: dict[str, Any] = {}
    keys = items[0].keys()
    for k in keys:
        vals = [it[k] for it in items]
        if k == "txt":
            if tokenizer is not None:
                out["tokens"] = np.stack([tokenize_txt(tokenizer, v) for v in vals])
            else:
                out["txt"] = vals
        elif isinstance(vals[0], np.ndarray) or np.isscalar(vals[0]):
            out[k] = np.stack([np.asarray(v) for v in vals])
        else:
            out[k] = vals
    return out


def flatten_views(batch: dict) -> dict:
    """Multi-view 5-D batches (B,V,H,W,C) -> (B*V,H,W,C), tokens (B,V,77) ->
    (B*V,77) (multiview_ref_inpainting_ldm.py:100-111)."""
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.ndim >= 3:
            out[k] = v.reshape(v.shape[0] * v.shape[1], *v.shape[2:])
        else:
            out[k] = v
    return out


class DataLoader:
    """Minimal epoch-aware loader: sampler indices -> threaded __getitem__ ->
    collate -> prefetch queue."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        sampler: Optional[Iterable[int]] = None,
        tokenizer: Optional[SimpleTokenizer] = None,
        shuffle: bool = False,
        drop_last: bool = True,
        num_workers: int = 8,
        prefetch: int = 2,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.tokenizer = tokenizer
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        if self.sampler is not None and hasattr(self.sampler, "set_epoch"):
            self.sampler.set_epoch(epoch)

    def _indices(self) -> list[int]:
        if self.sampler is not None:
            return list(iter(self.sampler))
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        return idx

    def __len__(self) -> int:
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        indices = self._indices()
        if self.drop_last:
            indices = indices[: len(indices) // self.batch_size * self.batch_size]
        batches = [
            indices[i : i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for batch_idx in batches:
                    if stop.is_set():
                        return
                    items = list(pool.map(self.dataset.__getitem__, batch_idx))
                    q.put(collate(items, self.tokenizer))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                b = q.get()
                if b is None:
                    break
                yield b
        finally:
            stop.set()
