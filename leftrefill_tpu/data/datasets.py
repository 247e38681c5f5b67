"""Datasets: cross-view / multi-view / single-image / test / Objaverse-NVS.

Behavioural reference: /root/reference/dataloaders/ —
- InpaintingCrossViewDataset (inpainting_crossview_dataset.py:18-371):
  MegaDepth pairs, resize-or-random-crop to img_size^2, left/right stitch
  with 50% side swap unless constant_place, irregular/segment/union +
  match-based masks, 50-token or template prompts; returns image [-1,1]
  (H,2W,3), mask (H,2W,1), masked_image, txt.
- InpaintingMultiViewDataset (:374-766): target + (view_num-1) sources,
  5-D stack (V,H,W,C) with only view 0 masked; concat_target emits (V-1)
  stitched canvases; per-view prompts with <view_direct-j-l> suffixes.
- BalancedRandomSampler (:771-839): scene-bucketed epoch sampling with the
  rank-strided split — the reference's entire distributed-data story.
- InpaintingDataset (inpainting_dataset.py:11-189): plain single-image
  inpainting/outpainting (right-strip mask at test).
- TestInpaintingDataset (test_dataset.py:9-105).
- NVS_OBJDataset (obj_nvs_dataset.py:12-204): Objaverse renders, alpha ->
  white bg, dilated object masks + polylines, relative pose via
  cartesian->spherical.

All torch-free; items are numpy dicts consumed by the host input pipeline.
"""

from __future__ import annotations

import collections
import math
import os
import pickle
import random
from glob import glob
from typing import Any, Optional, Sequence

import cv2
import numpy as np

from leftrefill_tpu.data.masks import (
    FileMaskSampler,
    match_based_mask,
    nvs_object_mask,
)

PROMPT_TEMPLATES = [
    "Both {left} and {right} images show the {real} with different {task}.",
    "The {real} remains the same in both the {left} and {right} images, but the {task} are different.",
    "The {left} and {right} images depict identical {real}, but from different {task}.",
    "The painting depicts the {real}, but from two different {task}; one from the {left} and one from the {right}.",
    "Both figures capture the same {real}, but the {left} one and the {right} one are taken from different {task}.",
    "The two drawings show the {real}, but one is from the {left} side and the other is from the {right} side, and they are from different {task}",
    "Both pictures depict the same {real}, but the {left} image and the {right} image are captured with different {task}.",
]


def build_prompt(
    repeat_sp_token: int,
    sp_token: Optional[str],
    token_map: Optional[dict] = None,
    mode: str = "train",
    deep_prompt: bool = False,
    cross_attn_layers: int = 16,
    rng: random.Random | None = None,
):
    """get_prompt (inpainting_crossview_dataset.py:250-279): the repeated
    special-token prompt, per-layer variants for deep_prompt, or one of 7
    natural-language templates."""
    if repeat_sp_token > 0 and sp_token is not None:
        text = " ".join(sp_token.replace(">", f"{i}>") for i in range(repeat_sp_token))
        if deep_prompt:
            return [text.replace(">", f"-layer{i}>") for i in range(cross_attn_layers)]
        return text
    tm = token_map or {}
    templates = [
        t.format(
            left=tm.get("left_token", "<left>"),
            right=tm.get("right_token", "<right>"),
            task=tm.get("task_token", "<viewpoints>"),
            real=tm.get("real_token", "<same-scene>"),
        )
        for t in PROMPT_TEMPLATES
    ]
    if mode == "train":
        return (rng or random).choice(templates)
    return templates[0]


def _read_rgb(path: str) -> np.ndarray:
    img = cv2.imread(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def _find_image(path_no_ext: str) -> str:
    for ext in (".jpg", ".png"):
        if os.path.exists(path_no_ext + ext):
            return path_no_ext + ext
    return path_no_ext + ".jpg"


class InpaintingCrossViewDataset:
    """MegaDepth reference-guided inpainting pairs."""

    def __init__(
        self,
        image_path,
        pair_path,
        mask_path,
        mode: str = "train",
        img_size: int = 256,
        only_mask_image: bool = False,
        no_padding: bool = True,
        token_map: Optional[dict] = None,
        view_mask_rate: float = 0.9,
        test_limit: int = 150,
        flip: bool = False,
        constant_place: bool = False,
        seed: Optional[int] = None,
        **kwargs,
    ):
        self.rng = random.Random(seed) if seed is not None else random
        if mode == "train":
            with open(image_path, "rb") as f:
                self.image_dict = pickle.load(f)
            with open(pair_path, "rb") as f:
                self.pairs = pickle.load(f)
        else:
            if os.path.isdir(image_path):
                self.pairs = sorted(glob(image_path + "/*"), key=lambda x: x.split("/")[-1])
                split_n = max(len(self.pairs) // test_limit, 1)
                self.pairs = self.pairs[::split_n]
            else:
                files = []
                with open(image_path[1]) as f:
                    files.extend(f.readlines())
                with open(image_path[0]) as f:
                    files.extend(f.readlines()[: test_limit - len(files)])
                self.pairs = [p.strip() for p in files]

        self.mode = mode
        self.img_size = img_size
        self.only_mask_image = only_mask_image
        self.no_padding = no_padding
        self.token_map = token_map
        self.view_mask_rate = view_mask_rate
        self.repeat_sp_token = kwargs.get("repeat_sp_token", 0)
        self.sp_token = kwargs.get("sp_token")
        self.match_mask = kwargs.get("match_mask", False)
        self.match_mask_rate = kwargs.get("match_mask_rate", 0.0)
        self.match_path = kwargs.get("match_path")
        self.deep_prompt = kwargs.get("deep_prompt", False)
        self.cross_attn_layers = 16
        self.flip = flip
        self.constant_place = constant_place

        if mode == "train":
            self.mask_sampler = FileMaskSampler(
                _read_list(mask_path[0]), _read_list(mask_path[1]), img_size, self.rng
            )
            self.mask_list = None
        else:
            # mask_path may be omitted when every pair dir ships a mask.png
            self.mask_list = (
                sorted(glob(mask_path + "/*"), key=lambda x: x.split("/")[-1])
                if mask_path
                else None
            )
            self.mask_sampler = None

    def __len__(self):
        return len(self.pairs)

    def resize_and_crop(self, image: np.ndarray):
        """resize-or-random-crop (inpainting_crossview_dataset.py:77-98)."""
        crop_info = None
        s = self.img_size
        if self.mode == "train" and self.rng.random() >= 0.5:
            h, w, _ = image.shape
            if h < w:
                long_side = max(s, int(w * (s / h)))
                image = cv2.resize(image, (long_side, s), interpolation=cv2.INTER_AREA)
            else:
                long_side = max(s, int(h * (s / w)))
                image = cv2.resize(image, (s, long_side), interpolation=cv2.INTER_AREA)
            rh, rw, _ = image.shape
            w_start = self.rng.randint(0, image.shape[1] - s)
            h_start = self.rng.randint(0, image.shape[0] - s)
            image = image[h_start : h_start + s, w_start : w_start + s]
            crop_info = {"w_start": w_start, "h_start": h_start, "w": rw, "h": rh}
        else:
            image = cv2.resize(image, (s, s), interpolation=cv2.INTER_AREA)
        return image, crop_info

    def load_mask(self, idx, gt_pos, target_crop_info, source_crop_info) -> np.ndarray:
        if self.match_mask and self.rng.random() < self.match_mask_rate:
            pkl_name = os.path.join(self.match_path or "", str(idx).zfill(8) + ".pkl")
            if os.path.exists(pkl_name):
                with open(pkl_name, "rb") as f:
                    res = pickle.load(f)
                mask = match_based_mask(
                    res, self.img_size, gt_pos, self.constant_place,
                    target_crop_info, source_crop_info, self.rng,
                )
                if mask is not None:
                    return mask
        return self.mask_sampler.sample_canvas()

    def __getitem__(self, idx: int) -> dict:
        pair = self.pairs[idx]
        if self.mode == "train":
            source_filename = self.image_dict[pair["source"]]
            target_filename = self.image_dict[pair["target"]]
        else:
            source_filename = _find_image(pair + "/source")
            target_filename = _find_image(pair + "/target")

        source, source_crop_info = self.resize_and_crop(_read_rgb(source_filename))
        target, target_crop_info = self.resize_and_crop(_read_rgb(target_filename))

        if self.mode == "train" and self.rng.random() < 0.5 and not self.constant_place:
            gt_pos = "left"
            image = np.concatenate([target, source], axis=1)
        else:
            gt_pos = "right"
            image = np.concatenate([source, target], axis=1)

        s = self.img_size
        if self.mode == "train":
            if self.only_mask_image:
                mask = np.zeros((s, 2 * s), np.float32)
                if gt_pos == "left":
                    mask[:, :s] = 1
                else:
                    mask[:, s:] = 1
            elif self.rng.random() < 1.0 - self.view_mask_rate:
                mask = self.load_mask(idx, gt_pos, target_crop_info, source_crop_info)
            else:
                mask = np.zeros((s, 2 * s), np.float32)
                if self.rng.random() < 0.5:
                    mask[:, :s] = 1
                else:
                    mask[:, s:] = 1
        else:
            mask_file = pair + "/mask.png"
            if not os.path.exists(mask_file):
                mask_file = self.mask_list[idx % len(self.mask_list)]
            half = cv2.imread(mask_file, cv2.IMREAD_GRAYSCALE)
            half = cv2.resize(half, (s, s), interpolation=cv2.INTER_NEAREST)
            half = (half > 127).astype(np.float32)
            mask = np.concatenate([np.zeros_like(half), half], axis=1)

        if self.mode == "train" and self.flip:
            if self.rng.random() < 0.5:
                image[:, :s] = image[:, :s][:, ::-1]
                mask[:, :s] = mask[:, :s][:, ::-1]
            if self.rng.random() < 0.5:
                image[:, s:] = image[:, s:][:, ::-1]
                mask[:, s:] = mask[:, s:][:, ::-1]

        image = (image.astype(np.float32) / 127.5) - 1.0
        mask = mask[:, :, None].astype(np.float32)
        masked_image = image * (mask < 0.5)
        prompt = build_prompt(
            self.repeat_sp_token, self.sp_token, self.token_map, self.mode,
            self.deep_prompt, self.cross_attn_layers, self.rng if self.rng is not random else None,
        )
        return dict(image=image, txt=prompt, masked_image=masked_image, mask=mask)


def _read_list(path: str) -> list[str]:
    with open(path) as f:
        return sorted((l.strip() for l in f.readlines()), key=lambda x: x.split("/")[-1])


class InpaintingMultiViewDataset(InpaintingCrossViewDataset):
    """Target + (view_num-1) reference views; 5-D output (V,H,W,C) with only
    view 0 masked (inpainting_crossview_dataset.py:374-766)."""

    def __init__(self, *args, max_ref_view: int = 3, **kwargs):
        self.view_num = kwargs.pop("view_num", 4)
        self.view_token_len = kwargs.pop("view_token_len", 30)
        self.source_shuffle = kwargs.pop("source_shuffle", False)
        self.concat_target = kwargs.pop("concat_target", False)
        super().__init__(*args, **kwargs)
        self.max_ref_view = max_ref_view

    def get_view_prompts(self) -> list[str]:
        """Per-view prompts with <view_direct-j-l> suffixes (note: the
        closing '>' IS present in the dataset prompt strings,
        inpainting_crossview_dataset.py:617-631, while the tokenizer's
        special-token table lacks it — so the dataset token matches the
        table's prefix)."""
        base = build_prompt(self.repeat_sp_token, self.sp_token, self.token_map, self.mode)
        n = self.view_num - 1 if self.concat_target else self.view_num
        prompts = []
        for j in range(n):
            t = base
            for l in range(self.view_token_len):
                t = t + f"<view_direct-{j}-{l}>"
            prompts.append(t)
        return prompts

    def __getitem__(self, idx: int) -> dict:
        pair = self.pairs[idx]
        s = self.img_size
        if self.mode == "train":
            target_filename = self.image_dict[pair["target"][0]]
            source_filenames = [self.image_dict[i] for i in pair["source"]]
            pair_idx = pair.get("idx", idx) if isinstance(pair, dict) else idx
        else:
            source_filenames = [
                _find_image(pair + "/source"),
                _find_image(pair + "/source_1"),
                _find_image(pair + "/source_2"),
                _find_image(pair + "/source_3"),
            ]
            target_filename = _find_image(pair + "/target")
            pair_idx = idx

        target, target_crop_info = self.resize_and_crop(_read_rgb(target_filename))
        if self.source_shuffle:
            order = np.random.choice(self.view_num - 1, self.view_num - 1, replace=False)
        else:
            order = range(self.view_num - 1)
        sources = [self.resize_and_crop(_read_rgb(source_filenames[i]))[0] for i in order]
        image = np.array([target, *sources])

        if self.mode == "train":
            if self.rng.random() < 1.0 - self.view_mask_rate:
                # multi-view masks are half-size, no side placement
                # (inpainting_crossview_dataset.py:561-592)
                mask = None
                if self.match_mask and self.rng.random() < self.match_mask_rate:
                    pkl_name = os.path.join(self.match_path or "", str(pair_idx).zfill(8) + ".pkl")
                    if os.path.exists(pkl_name):
                        with open(pkl_name, "rb") as f:
                            res = pickle.load(f)
                        mask = match_based_mask(
                            res, s, "right", self.constant_place,
                            target_crop_info, None, self.rng, place_on_canvas=False,
                        )
                if mask is None:
                    mask = self.mask_sampler.sample_half()
            else:
                mask = np.ones((s, s), np.float32)
        else:
            mask_file = pair + "/mask.png"
            if not os.path.exists(mask_file):
                mask_file = self.mask_list[idx % len(self.mask_list)]
            mask = cv2.imread(mask_file, cv2.IMREAD_GRAYSCALE)
            mask = cv2.resize(mask, (s, s), interpolation=cv2.INTER_NEAREST)
            mask = (mask > 127).astype(np.float32)

        image = (image.astype(np.float32) / 127.5) - 1.0
        mask = mask[:, :, None].astype(np.float32)
        masked_image = image.copy()
        masked_image[0] = masked_image[0] * (mask < 0.5)
        final_mask = np.repeat(mask[None], len(image), axis=0)
        final_mask[1:] = 0

        if self.concat_target:
            v = self.view_num - 1
            ci = np.zeros((v, s, 2 * s, 3), np.float32)
            cm = np.zeros((v, s, 2 * s, 3), np.float32)
            cmask = np.zeros((v, s, 2 * s, 1), np.float32)
            for i in range(len(sources)):
                ci[i, :, s:] = image[0]
                ci[i, :, :s] = image[i + 1]
                cm[i, :, s:] = masked_image[0]
                cm[i, :, :s] = masked_image[i + 1]
                cmask[i, :, s:] = final_mask[0]
                cmask[i, :, :s] = final_mask[i + 1]
            image, masked_image, final_mask = ci, cm, cmask

        return dict(
            image=image,
            txt=self.get_view_prompts(),
            masked_image=masked_image,
            mask=final_mask,
            idx=int(str(pair).split("/")[-1]) if self.mode != "train" and str(pair).split("/")[-1].isdigit() else pair_idx,
        )


class InpaintingDataset:
    """Plain single-image inpainting/outpainting (inpainting_dataset.py:11-189),
    used when cross_view_inpainting is false.  Test masks the right strip."""

    def __init__(
        self,
        image_path,
        mask_path,
        mode: str = "train",
        img_size: int = 256,
        token_map: Optional[dict] = None,
        test_limit: int = 150,
        right_strip_frac: float = 0.5,
        seed: Optional[int] = None,
        **kwargs,
    ):
        self.rng = random.Random(seed) if seed is not None else random
        if os.path.isdir(image_path):
            self.files = sorted(glob(image_path + "/*"))
        else:
            with open(image_path) as f:
                self.files = [l.strip() for l in f.readlines()]
        if mode != "train" and len(self.files) > test_limit:
            self.files = self.files[:: len(self.files) // test_limit]
        self.mode = mode
        self.img_size = img_size
        self.token_map = token_map
        self.repeat_sp_token = kwargs.get("repeat_sp_token", 0)
        self.sp_token = kwargs.get("sp_token")
        self.right_strip_frac = right_strip_frac
        if mode == "train":
            self.mask_sampler = FileMaskSampler(
                _read_list(mask_path[0]) if mask_path else None,
                _read_list(mask_path[1]) if mask_path and len(mask_path) > 1 else None,
                img_size,
                self.rng,
            )
        else:
            self.mask_sampler = None

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx: int) -> dict:
        s = self.img_size
        image = cv2.resize(_read_rgb(self.files[idx]), (s, s), interpolation=cv2.INTER_AREA)
        if self.mode == "train":
            mask = self.mask_sampler.sample_half()
        else:  # right-strip outpainting mask (inpainting_dataset.py:113-118)
            mask = np.zeros((s, s), np.float32)
            mask[:, int(s * (1 - self.right_strip_frac)) :] = 1
        image = (image.astype(np.float32) / 127.5) - 1.0
        mask = mask[:, :, None].astype(np.float32)
        return dict(
            image=image,
            txt=build_prompt(self.repeat_sp_token, self.sp_token, self.token_map, self.mode),
            masked_image=image * (mask < 0.5),
            mask=mask,
        )


class TestInpaintingDataset:
    """Dirs of {source,target,mask} (test_dataset.py:9-105); deterministic
    resize, mask always right, no thresholding of the mask file."""

    def __init__(self, root_path, img_size=256, token_map=None, mask_path=None, **kwargs):
        self.img_size = img_size
        self.token_map = token_map
        if os.path.isdir(root_path):
            self.pairs = sorted(glob(root_path + "/*"), key=lambda x: x.split("/")[-1])
        else:
            with open(root_path) as f:
                self.pairs = [p.strip() for p in f.readlines()]
        self.mask_list = (
            sorted(glob(mask_path + "/*"), key=lambda x: x.split("/")[-1])
            if mask_path
            else None
        )
        self.repeat_sp_token = kwargs.get("repeat_sp_token", 0)
        self.sp_token = kwargs.get("sp_token")
        self.deep_prompt = kwargs.get("deep_prompt", False)

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, idx: int) -> dict:
        pair = self.pairs[idx]
        s = self.img_size
        source = cv2.resize(_read_rgb(_find_image(pair + "/source")), (s, s), interpolation=cv2.INTER_AREA)
        target = cv2.resize(_read_rgb(_find_image(pair + "/target")), (s, s), interpolation=cv2.INTER_AREA)
        image = np.concatenate([source, target], axis=1)
        image = (image.astype(np.float32) / 127.5) - 1.0

        mask_file = (
            pair + "/mask.png" if self.mask_list is None else self.mask_list[idx % len(self.mask_list)]
        )
        mask = cv2.imread(mask_file)[:, :, 0]
        mask = cv2.resize(mask, (s, s), interpolation=cv2.INTER_NEAREST)
        mask = (mask.astype(np.float32) / 255.0)[:, :, None]
        mask = np.concatenate([np.zeros_like(mask), mask], axis=1)
        return dict(
            image=image,
            txt=build_prompt(self.repeat_sp_token, self.sp_token, self.token_map, "test", self.deep_prompt),
            masked_image=image * (mask < 0.5),
            mask=mask,
        )


def cartesian_to_spherical(xyz: np.ndarray) -> np.ndarray:
    """obj_nvs_dataset.py:83-90."""
    xy = xyz[:, 0] ** 2 + xyz[:, 1] ** 2
    z = np.sqrt(xy + xyz[:, 2] ** 2)
    theta = np.arctan2(np.sqrt(xy), xyz[:, 2])
    azimuth = np.arctan2(xyz[:, 1], xyz[:, 0])
    return np.array([theta, azimuth, z])


def get_relative_pose(target_RT: np.ndarray, cond_RT: np.ndarray) -> np.ndarray:
    """(dθ, sin dφ, cos dφ, dz) from two [3,4] world-to-cam matrices
    (obj_nvs_dataset.py:92-107)."""
    R, T = target_RT[:3, :3], target_RT[:, -1]
    t_target = -R.T @ T
    R, T = cond_RT[:3, :3], cond_RT[:, -1]
    t_cond = -R.T @ T
    th_c, az_c, z_c = cartesian_to_spherical(t_cond[None])
    th_t, az_t, z_t = cartesian_to_spherical(t_target[None])
    d_theta = th_t - th_c
    d_az = (az_t - az_c) % (2 * math.pi)
    d_z = z_t - z_c
    return np.array(
        [d_theta.item(), math.sin(d_az.item()), math.cos(d_az.item()), d_z.item()],
        np.float32,
    )


class NVS_OBJDataset:
    """Objaverse renders for NVS (obj_nvs_dataset.py:12-204)."""

    def __init__(
        self,
        datapath,
        listfile,
        mode="train",
        img_size=512,
        nviews=12,
        token_map=None,
        test_limit=150,
        dilate_size=(8, 20),
        pts_size=(15, 30),
        mask_enlarge=(0.0, 0.0),
        mask_file_path=None,
        mask_type="fix",
        width_range=(60, 120),
        complete_mask_rate=0.0,
        use_ref_mask=False,
        seed: Optional[int] = None,
        **kwargs,
    ):
        self.rng = random.Random(seed) if seed is not None else random
        with open(listfile) as f:
            self.metas = [os.path.join(datapath, l.strip()) for l in f.readlines()]
        if mode == "val" and test_limit < len(self.metas):
            self.metas = self.metas[:: len(self.metas) // test_limit]
        self.mode = mode
        self.img_size = img_size
        self.nviews = nviews
        self.token_map = token_map
        self.repeat_sp_token = kwargs.get("repeat_sp_token", 0)
        self.sp_token = kwargs.get("sp_token")
        self.deep_prompt = kwargs.get("deep_prompt", False)
        self.dilate_size = dilate_size
        self.pts_size = pts_size
        self.mask_enlarge = mask_enlarge
        self.mask_file_path = mask_file_path
        self.mask_type = mask_type
        self.width_range = width_range
        self.complete_mask_rate = complete_mask_rate
        self.use_ref_mask = use_ref_mask
        # the dataset's mask-rate curriculum mutates this live
        # (NVS_ldm.py:299-306)
        self.warmup_mask_steps = kwargs.get("warmup_mask_steps", 0)

    def __len__(self):
        return len(self.metas)

    def _load_view(self, filename: str, index: int):
        im = cv2.imread(os.path.join(filename, "%03d.png" % index), cv2.IMREAD_UNCHANGED) / 255.0
        alpha_mask = im[:, :, -1].copy()
        alpha_mask[alpha_mask > 0] = 1
        im[im[:, :, -1] == 0.0] = [1.0, 1.0, 1.0, 1.0]
        rgb = (im[:, :, :3] * 255.0).astype(np.uint8)[:, :, ::-1]
        return rgb, alpha_mask.astype(np.float32)

    def __getitem__(self, idx: int) -> dict:
        filename = self.metas[idx]
        s = self.img_size
        if self.mode == "train":
            index_target, index_cond = self.rng.sample(range(self.nviews), 2)
        else:
            index_target, index_cond = 0, 2

        target_im, mask = self._load_view(filename, index_target)
        cond_im, _ = self._load_view(filename, index_cond)
        target_im = cv2.resize(target_im, (s, s))
        cond_im = cv2.resize(cond_im, (s, s))
        mask = cv2.resize(mask, (s, s), interpolation=cv2.INTER_AREA)
        mask[mask > 0] = 1

        if self.mask_file_path is not None and self.mode != "train" and self.mask_type == "fix":
            i = index_cond if self.use_ref_mask else index_target
            mask = (
                cv2.imread(os.path.join(self.mask_file_path, filename.split("/")[-1], "%03d.png" % i))[:, :, 0]
                / 255.0
            ).astype(np.float32)
        elif self.mode != "train" and self.mask_type == "complete":
            mask = np.ones((s, s), np.float32)
        else:
            mask = nvs_object_mask(
                mask, s, self.dilate_size, self.pts_size, self.mask_enlarge,
                self.width_range, self.complete_mask_rate, self.rng,
            )

        image = np.concatenate([cond_im, target_im], axis=1)
        mask = np.concatenate([np.zeros_like(mask), mask], axis=1)
        image = (image.astype(np.float32) / 127.5) - 1.0
        mask = mask[:, :, None].astype(np.float32)
        if self.mode != "train" and self.use_ref_mask:
            masked = np.concatenate([cond_im, np.ones_like(cond_im) * 255], axis=1)
            masked = (masked.astype(np.float32) / 127.5) - 1.0
            masked_image = masked * (mask < 0.5)
        else:
            masked_image = image * (mask < 0.5)

        target_RT = np.load(os.path.join(filename, "%03d.npy" % index_target))
        cond_RT = np.load(os.path.join(filename, "%03d.npy" % index_cond))
        return dict(
            image=image,
            masked_image=masked_image,
            mask=mask,
            rel_pose=get_relative_pose(target_RT, cond_RT),
            txt=build_prompt(self.repeat_sp_token, self.sp_token, self.token_map, self.mode),
        )


class BalancedRandomSampler:
    """Scene-bucketed, epoch-seeded, rank-strided index sampler
    (inpainting_crossview_dataset.py:771-839) — the reference's distributed
    data sharding, reproduced exactly (epoch-seeded python random, global
    shuffle, indices[rank::num_replicas])."""

    def __init__(self, image_dict, pairs, n_sample_per_scene=100, rank=0, num_replicas=1):
        if rank >= num_replicas or rank < 0:
            raise ValueError(
                f"Invalid rank {rank}, rank should be in the interval [0, {num_replicas - 1}]"
            )
        self.n_sample_per_scene = n_sample_per_scene
        self.rank = rank
        self.num_replicas = num_replicas
        self.epoch = 0
        self.scene_idx = collections.defaultdict(list)
        for i, p in enumerate(pairs):
            # multi-view pair pkls store 'source' as an id list
            # (extend_data_for_multiview.py); bucket by the primary source
            src = p["source"][0] if isinstance(p["source"], (list, tuple)) else p["source"]
            scene = image_dict[src].split("/")[-3]
            self.scene_idx[scene].append(i)
        for scene in self.scene_idx:
            if n_sample_per_scene > len(self.scene_idx[scene]):
                raise ValueError(
                    "n_sample_per_scene should be less than the min scene sample "
                    f"but got {n_sample_per_scene}>{len(self.scene_idx[scene])}"
                )
        self.n_scene = len(self.scene_idx)
        total_size = self.n_scene * self.n_sample_per_scene
        if total_size % num_replicas != 0:
            self.num_samples = math.ceil((total_size - num_replicas) / num_replicas)
        else:
            self.num_samples = math.ceil(total_size / num_replicas)
        self.total_size = self.num_samples * num_replicas

    def __iter__(self):
        rng = random.Random(self.epoch)
        new_list = []
        for scene in self.scene_idx:
            idxs = list(self.scene_idx[scene])
            rng.shuffle(idxs)
            self.scene_idx[scene] = idxs
            new_list.extend(idxs[: self.n_sample_per_scene])
        rng.shuffle(new_list)
        indices = new_list[: self.total_size]
        assert len(indices) == self.total_size
        indices = indices[self.rank : self.total_size : self.num_replicas]
        assert len(indices) == self.num_samples
        return iter(indices)

    def __len__(self):
        return self.num_samples

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
