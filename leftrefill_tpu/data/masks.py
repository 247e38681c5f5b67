"""Mask synthesis shared by the datasets.

Behavioural reference: /root/reference/dataloaders/inpainting_crossview_dataset.py
- file-based irregular/segmentation/union masks (get_inpainting_mask:200-229):
  40% irregular, 40% segmentation, 20% union, thresholded at 127, then one
  side of the stitched canvas is chosen at random,
- match-based polyline masks (get_match_based_mask:100-198): thick closed
  polyline + vertex ellipses through high-score matcher keypoints,
- the NVS polyline enlargement (obj_nvs_dataset.py:142-177).

A synthetic LaMa-style stroke generator is provided as a fallback for
environments without the LaMa/COCO mask file lists (flagged, not part of the
reference protocol).
"""

from __future__ import annotations

import math
import random
from typing import Sequence

import cv2
import numpy as np
from PIL import Image, ImageDraw


def load_mask_file(path: str, img_size: int) -> np.ndarray:
    """Grayscale mask file -> {0,1} float32 [img_size, img_size]."""
    mask = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    mask = cv2.resize(mask, (img_size, img_size), interpolation=cv2.INTER_NEAREST)
    mask = (mask > 127).astype(np.float32)
    return mask


def draw_polyline_mask(
    points: np.ndarray, size: int, width: int, canvas_size: int | None = None
) -> np.ndarray:
    """Closed thick polyline + vertex ellipses (the reference's PIL drawing,
    inpainting_crossview_dataset.py:181-186)."""
    canvas_size = canvas_size or size
    mask = Image.new("L", (canvas_size, canvas_size), 0)
    draw = ImageDraw.Draw(mask)
    pts = np.append(points, points[:1], axis=0).astype(np.float32)
    draw.line([tuple(p) for p in pts], fill=1, width=width)
    for v in pts:
        draw.ellipse(
            (v[0] - width // 2, v[1] - width // 2, v[0] + width // 2, v[1] + width // 2),
            fill=1,
        )
    return np.asarray(mask, np.float32).copy()


def random_stroke_mask(img_size: int, rng: random.Random | None = None) -> np.ndarray:
    """Synthetic fallback when no irregular/segmentation mask files exist
    (NOT in the reference — it ships LaMa/COCO file lists)."""
    rng = rng or random
    n_pts = rng.randint(6, 16)
    pts = np.stack(
        [
            np.asarray([rng.randint(0, img_size - 1) for _ in range(n_pts)]),
            np.asarray([rng.randint(0, img_size - 1) for _ in range(n_pts)]),
        ],
        axis=1,
    )
    width = rng.randint(img_size // 12, img_size // 5)
    return np.clip(draw_polyline_mask(pts, img_size, width), 0, 1)


class FileMaskSampler:
    """get_inpainting_mask (inpainting_crossview_dataset.py:200-229): 40%
    irregular, 40% segmentation, 20% union; thresholded; the caller places the
    half-mask on a canvas side."""

    def __init__(
        self,
        irregular_list: Sequence[str] | None,
        segment_list: Sequence[str] | None,
        img_size: int,
        rng: random.Random | None = None,
    ):
        self.irregular = list(irregular_list or [])
        self.segment = list(segment_list or [])
        self.img_size = img_size
        self.rng = rng or random

    def sample_half(self) -> np.ndarray:
        """[img_size, img_size] single-side mask in {0,1}."""
        if not self.irregular and not self.segment:
            return random_stroke_mask(self.img_size, self.rng)
        rdv = self.rng.random()
        if rdv < 0.4 and self.irregular:
            return load_mask_file(
                self.irregular[self.rng.randint(0, len(self.irregular) - 1)], self.img_size
            )
        if rdv < 0.8 and self.segment:
            return load_mask_file(
                self.segment[self.rng.randint(0, len(self.segment) - 1)], self.img_size
            )
        if self.segment and self.irregular:
            m1 = load_mask_file(
                self.segment[self.rng.randint(0, len(self.segment) - 1)], self.img_size
            )
            m2 = load_mask_file(
                self.irregular[self.rng.randint(0, len(self.irregular) - 1)], self.img_size
            )
            return np.clip(m1 + m2, 0, 1)
        pool = self.segment or self.irregular
        return load_mask_file(pool[self.rng.randint(0, len(pool) - 1)], self.img_size)

    def sample_canvas(self) -> np.ndarray:
        """[img_size, 2*img_size]: the half mask placed on a random side
        (inpainting_crossview_dataset.py:222-228)."""
        mask = self.sample_half()
        zero = np.zeros_like(mask)
        if self.rng.random() < 0.5:
            return np.concatenate([mask, zero], axis=1)
        return np.concatenate([zero, mask], axis=1)


def match_based_mask(
    match_result: dict,
    img_size: int,
    target_pos: str = "left",
    constant_place: bool = True,
    target_crop_info: dict | None = None,
    source_crop_info: dict | None = None,
    rng: random.Random | None = None,
    place_on_canvas: bool = True,
) -> np.ndarray | None:
    """get_match_based_mask (inpainting_crossview_dataset.py:100-198): draw a
    thick polyline through high-score match keypoints inside a random
    rectangle; returns the full-canvas mask or None when the match is too
    weak.  match_result: {'scores': [N], 'mkpts0': [N,2], 'mkpts1': [N,2]}."""
    rng = rng or random
    min_width, max_width = 35, 70
    min_area_rate, max_area_rate = 0.2, 0.5
    num_vertex = rng.randint(15, 30)
    min_num = 10
    match_size, match_mask_size = 832, 256
    threshold_prob = 0.8

    scores = np.asarray(match_result["scores"])
    if scores.size == 0:
        return None
    scores_max = scores.max()
    rdv = 1.0 if constant_place else rng.random()
    if rdv < 0.5:
        mask_left = True
        mkpt = "mkpts0" if target_pos == "left" else "mkpts1"
        crop_info = target_crop_info if target_pos == "left" else source_crop_info
    else:
        mask_left = False
        mkpt = "mkpts1" if target_pos == "left" else "mkpts0"
        crop_info = source_crop_info if target_pos == "left" else target_crop_info

    good_pts = np.asarray(match_result[mkpt])[scores > scores_max * threshold_prob]
    if crop_info is None:
        good_pts = good_pts / match_size * match_mask_size
    else:
        good_pts = good_pts / match_size
        good_pts = good_pts.copy()
        good_pts[:, 0] *= crop_info["w"]
        good_pts[:, 1] *= crop_info["h"]
        good_pts[:, 0] -= crop_info["w_start"]
        good_pts[:, 1] -= crop_info["h_start"]
        ms = min(crop_info["w"], crop_info["h"]) / match_mask_size
        good_pts /= ms
        keep = (
            (good_pts[:, 0] >= 0)
            & (good_pts[:, 1] >= 0)
            & (good_pts[:, 0] < match_mask_size)
            & (good_pts[:, 1] < match_mask_size)
        )
        good_pts = good_pts[keep]

    if len(good_pts) < min_num:
        return None

    x_min, x_max = good_pts[:, 0].min(), good_pts[:, 0].max()
    y_min, y_max = good_pts[:, 1].min(), good_pts[:, 1].max()
    good_w, good_h = x_max - x_min, y_max - y_min
    good_area = good_w * good_h
    if good_area == 0:
        return None

    rate = (
        match_mask_size**2
        * (min_area_rate + (max_area_rate - min_area_rate) * rng.random())
        / good_area
    )
    if rate < 1:
        a = good_w * math.sqrt(rate)
        b = good_h * math.sqrt(rate)
        x_start = x_min + np.random.randint(0, int(good_w - a) + 1)
        y_start = y_min + np.random.randint(0, int(good_h - b) + 1)
        sel = good_pts
        sel = sel[(sel[:, 0] > x_start) & (sel[:, 0] < x_start + a)]
        sel = sel[(sel[:, 1] > y_start) & (sel[:, 1] < y_start + b)]
        picked = np.random.permutation(sel)
    else:
        picked = np.random.permutation(good_pts)

    if picked.shape[0] < min_num:
        return None
    picked = picked[:num_vertex]
    width = np.random.randint(min_width, max_width)
    mask = draw_polyline_mask(picked, match_mask_size, int(width))
    if img_size != match_mask_size:
        mask = cv2.resize(mask, (img_size, img_size), interpolation=cv2.INTER_NEAREST)
    if not place_on_canvas:
        # the multi-view dataset uses the half-size mask directly
        # (inpainting_crossview_dataset.py:553-559 commented concat)
        return mask
    zero = np.zeros_like(mask)
    if mask_left:
        return np.concatenate([mask, zero], axis=1)
    return np.concatenate([zero, mask], axis=1)


def nvs_object_mask(
    object_mask: np.ndarray,
    img_size: int,
    dilate_size: Sequence[int] = (8, 20),
    pts_size: Sequence[int] = (15, 30),
    mask_enlarge: Sequence[float] = (0.0, 0.0),
    width_range: Sequence[int] = (60, 120),
    complete_mask_rate: float = 0.0,
    rng: random.Random | None = None,
) -> np.ndarray:
    """NVS training mask (obj_nvs_dataset.py:142-177): dilate the object's
    alpha mask, then union a random thick polyline within the (optionally
    enlarged) bbox; complete_mask_rate chance of the full canvas."""
    rng = rng or random
    if rng.random() < complete_mask_rate:
        return np.ones((img_size, img_size), np.float32)
    kernel_size = rng.randint(dilate_size[0], dilate_size[1])
    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (kernel_size, kernel_size))
    mask = cv2.dilate(object_mask, kernel, iterations=1)
    if mask.sum() == 0:
        return np.ones((img_size, img_size), np.float32)
    ys, xs = np.where(mask > 0)
    h_min, h_max = ys.min(), ys.max()
    w_min, w_max = xs.min(), xs.max()
    if mask_enlarge[1] > mask_enlarge[0]:
        enlarge = rng.random() * (mask_enlarge[1] - mask_enlarge[0]) + mask_enlarge[0]
        diff = max(h_max - h_min, w_max - w_min) * enlarge
        h_min = np.clip(h_min - diff, 0, img_size - 1)
        h_max = np.clip(h_max + diff, 0, img_size - 1)
        w_min = np.clip(w_min - diff, 0, img_size - 1)
        w_max = np.clip(w_max + diff, 0, img_size - 1)
    n = rng.randint(pts_size[0], pts_size[1])
    rx = np.random.randint(w_min, max(w_max, w_min + 1), size=n)
    ry = np.random.randint(h_min, max(h_max, h_min + 1), size=n)
    pts = np.stack([rx, ry], axis=1)
    min_w = width_range[0] * (img_size / 512)
    max_w = width_range[1] * (img_size / 512)
    width = int(np.random.randint(min_w, max(max_w, min_w + 1)))
    irr = draw_polyline_mask(pts, img_size, width)
    return np.clip(mask + irr, 0, 1).astype(np.float32)
