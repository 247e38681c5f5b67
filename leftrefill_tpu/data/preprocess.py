"""Offline dataset preprocessors.

Behavioural reference:
- MegaDepth pair builder: /root/reference/megadepth_overlap.py:1-91 — reads
  LoFTR scene-info npz files, filters train pairs by overlap score in
  [lo, hi], assigns global image ids, writes image_dict.pkl / train_pairs.pkl
  / test_pairs.pkl (+ a shuffled 100-pair subset).
- Multi-view extender: /root/reference/extend_data_for_multiview.py:1-97 —
  for each pair, finds extra source views with overlap >= min_overlap from
  the same scene info and writes an extended pair pkl with
  {'target': [id], 'source': [ids...], 'idx': pair_index}.
"""

from __future__ import annotations

import os
import pickle
import random
from glob import glob

import numpy as np

PROMPT = "[REFERENCE_INPAINTING]"


def build_megadepth_pairs(
    root_path: str,
    train_info_path: str,
    test_info_path: str,
    out_path: str,
    overlap: tuple[float, float] = (0.4, 0.7),
) -> dict:
    """Write image_dict.pkl / train_pairs.pkl / test_pairs.pkl (+100 subset)."""
    img_name_to_id: dict[str, int] = {}
    img_id_to_name: dict[int, str] = {}

    def intern(name: str) -> int:
        if name not in img_name_to_id:
            idx = len(img_name_to_id)
            img_name_to_id[name] = idx
            img_id_to_name[idx] = os.path.join(root_path, name)
        return img_name_to_id[name]

    def collect(info_path: str, filter_overlap: bool) -> list[dict]:
        pairs = []
        for f in sorted(glob(f"{info_path}/*.npz")):
            scene_info = np.load(f, allow_pickle=True)
            pair_infos = scene_info["pair_infos"]
            image_paths = scene_info["image_paths"]
            for idx in range(len(pair_infos)):
                (idx0, idx1), score, _ = pair_infos[idx]
                if filter_overlap and (score < overlap[0] or score > overlap[1]):
                    continue
                pairs.append(
                    {
                        "source": intern(image_paths[idx0]),
                        "target": intern(image_paths[idx1]),
                        "prompt": PROMPT,
                    }
                )
        return pairs

    train_set = collect(train_info_path, filter_overlap=True)
    test_set = collect(test_info_path, filter_overlap=False)

    os.makedirs(out_path, exist_ok=True)
    with open(f"{out_path}/image_dict.pkl", "wb") as w:
        pickle.dump(img_id_to_name, w)
    with open(f"{out_path}/train_pairs.pkl", "wb") as w:
        pickle.dump(train_set, w)
    with open(f"{out_path}/test_pairs.pkl", "wb") as w:
        pickle.dump(test_set, w)
    subset = list(test_set)
    random.shuffle(subset)
    with open(f"{out_path}/test_pairs_100.pkl", "wb") as w:
        pickle.dump(subset[:100], w)
    return {
        "images": len(img_id_to_name),
        "train_pairs": len(train_set),
        "test_pairs": len(test_set),
    }


def extend_pairs_for_multiview(
    info_path: str,
    pairs: list[dict],
    image_dict: dict[int, str],
    out_file: str,
    extra_views: int = 3,
    min_overlap: float = 0.2,
) -> list[dict]:
    """For each (source, target) pair, pick up to ``extra_views`` additional
    source views of the same scene with overlap >= min_overlap
    (extend_data_for_multiview.py:1-97).  Emits
    {'target': [tid], 'source': [sid, extra...], 'idx': i}."""
    # ids in image_dict carry the root prefix; index by relative-path suffix
    suffix_to_id: dict[str, int] = {}
    for i, full in image_dict.items():
        suffix_to_id[full] = i
        parts = full.split("/")
        for k in range(1, min(len(parts), 6)):
            suffix_to_id.setdefault("/".join(parts[-k:]), i)

    overlap_of: dict[tuple[int, int], float] = {}
    for f in sorted(glob(f"{info_path}/*.npz")):
        scene_info = np.load(f, allow_pickle=True)
        pair_infos = scene_info["pair_infos"]
        image_paths = scene_info["image_paths"]
        for idx in range(len(pair_infos)):
            (i0, i1), score, _ = pair_infos[idx]
            a = suffix_to_id.get(str(image_paths[i0]))
            b = suffix_to_id.get(str(image_paths[i1]))
            if a is None or b is None:
                continue
            overlap_of[(a, b)] = float(score)
            overlap_of[(b, a)] = float(score)

    extended = []
    for i, p in enumerate(pairs):
        src, tgt = p["source"], p["target"]
        candidates = [
            (s, ov)
            for (a, s), ov in overlap_of.items()
            if a == tgt and s not in (src, tgt) and ov >= min_overlap
        ]
        candidates.sort(key=lambda x: -x[1])
        extra = [s for s, _ in candidates[:extra_views]]
        extended.append({"target": [tgt], "source": [src] + extra, "idx": i})
    with open(out_file, "wb") as w:
        pickle.dump(extended, w)
    return extended
