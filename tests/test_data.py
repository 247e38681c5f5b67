"""Data layer tests with synthetic on-disk fixtures (formats per
/root/reference/dataloaders/*)."""

import math
import os
import pickle

import cv2
import numpy as np
import pytest

from leftrefill_tpu.data.datasets import (
    BalancedRandomSampler,
    InpaintingCrossViewDataset,
    InpaintingDataset,
    InpaintingMultiViewDataset,
    NVS_OBJDataset,
    TestInpaintingDataset,
    build_prompt,
    get_relative_pose,
)
from leftrefill_tpu.data.loader import DataLoader, collate, flatten_views


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    """Synthetic MegaDepth-like tree: images, mask files + lists, pair pkls,
    test dirs, objaverse renders."""
    root = tmp_path_factory.mktemp("data")
    rng = np.random.RandomState(0)

    # images for 2 scenes x 6 images (path layout scene/<x>/imgs/<name>)
    image_dict, pairs = {}, []
    iid = 0
    for scene in ("0001", "0002"):
        for i in range(6):
            # scene is taken from path segment [-3] (BalancedRandomSampler)
            d = root / "mega" / scene / "imgs"
            d.mkdir(parents=True, exist_ok=True)
            p = d / f"im{i}.jpg"
            cv2.imwrite(str(p), rng.randint(0, 255, (80, 96, 3), np.uint8))
            image_dict[iid] = str(p)
            iid += 1
    for s in range(2):
        base = s * 6
        for i in range(5):
            pairs.append({"source": base + i, "target": base + i + 1, "prompt": "x"})
    with open(root / "image_dict.pkl", "wb") as f:
        pickle.dump(image_dict, f)
    with open(root / "pairs.pkl", "wb") as f:
        pickle.dump(pairs, f)

    # mask files + lists
    mdir = root / "masks"
    mdir.mkdir()
    mask_files = []
    for i in range(4):
        p = mdir / f"m{i}.png"
        m = np.zeros((64, 64), np.uint8)
        m[8 * i : 8 * i + 24, 8 * i : 8 * i + 24] = 255
        cv2.imwrite(str(p), m)
        mask_files.append(str(p))
    irr_list = root / "irregular.txt"
    seg_list = root / "segment.txt"
    irr_list.write_text("\n".join(mask_files[:2]))
    seg_list.write_text("\n".join(mask_files[2:]))

    # test pair dirs
    for i in range(3):
        d = root / "testpairs" / f"{i:06d}"
        d.mkdir(parents=True)
        cv2.imwrite(str(d / "source.jpg"), rng.randint(0, 255, (64, 64, 3), np.uint8))
        cv2.imwrite(str(d / "target.jpg"), rng.randint(0, 255, (64, 64, 3), np.uint8))
        m = np.zeros((64, 64), np.uint8)
        m[16:48, 16:48] = 255
        cv2.imwrite(str(d / "mask.png"), m)

    # objaverse-like renders: 4 views of 2 objects, RGBA + [3,4] poses
    for obj in range(2):
        d = root / "objs" / f"obj{obj}"
        d.mkdir(parents=True)
        for v in range(4):
            im = np.zeros((64, 64, 4), np.uint8)
            im[16:48, 16:48, :3] = rng.randint(0, 255, (32, 32, 3))
            im[16:48, 16:48, 3] = 255
            cv2.imwrite(str(d / f"{v:03d}.png"), im)
            theta = v * math.pi / 4
            R = np.array(
                [[math.cos(theta), -math.sin(theta), 0],
                 [math.sin(theta), math.cos(theta), 0],
                 [0, 0, 1]]
            )
            T = np.array([0.0, 0.0, 2.0 + 0.1 * v])
            np.save(str(d / f"{v:03d}.npy"), np.concatenate([R, T[:, None]], axis=1))
    (root / "objs.txt").write_text("\n".join(f"obj{o}" for o in range(2)))
    return root, image_dict, pairs


CFG = dict(img_size=32, repeat_sp_token=4, sp_token="<special-token>")


def test_crossview_train_item(fixture_root):
    root, _, _ = fixture_root
    ds = InpaintingCrossViewDataset(
        image_path=str(root / "image_dict.pkl"),
        pair_path=str(root / "pairs.pkl"),
        mask_path=[str(root / "irregular.txt"), str(root / "segment.txt")],
        mode="train",
        view_mask_rate=0.0,
        constant_place=True,
        seed=0,
        **CFG,
    )
    item = ds[0]
    assert item["image"].shape == (32, 64, 3)
    assert item["mask"].shape == (32, 64, 1)
    assert item["masked_image"].shape == (32, 64, 3)
    assert item["image"].min() >= -1 and item["image"].max() <= 1
    assert set(np.unique(item["mask"])) <= {0.0, 1.0}
    # masked_image is zero exactly in the hole
    hole = item["mask"][..., 0] >= 0.5
    assert np.all(item["masked_image"][hole] == 0)
    assert item["txt"] == "<special-token0> <special-token1> <special-token2> <special-token3>"


def test_crossview_test_item(fixture_root):
    root, _, _ = fixture_root
    ds = InpaintingCrossViewDataset(
        image_path=str(root / "testpairs"),
        pair_path=None,
        mask_path=str(root / "masks"),
        mode="test",
        test_limit=3,
        **CFG,
    )
    item = ds[0]
    # test mask is always on the right half
    assert item["mask"][:, :32].sum() == 0
    assert item["mask"][:, 32:].sum() > 0


def test_multiview_item_shapes(fixture_root):
    root, _, _ = fixture_root
    # train pairs with multi-source layout
    pairs = [{"target": [1], "source": [0, 2, 3], "idx": 0}]
    with open(root / "mv_pairs.pkl", "wb") as f:
        pickle.dump(pairs, f)
    ds = InpaintingMultiViewDataset(
        image_path=str(root / "image_dict.pkl"),
        pair_path=str(root / "mv_pairs.pkl"),
        mask_path=[str(root / "irregular.txt"), str(root / "segment.txt")],
        mode="train",
        view_mask_rate=0.0,
        view_num=4,
        view_token_len=2,
        seed=0,
        **CFG,
    )
    item = ds[0]
    assert item["image"].shape == (4, 32, 32, 3)
    assert item["mask"].shape == (4, 32, 32, 1)
    assert item["mask"][1:].sum() == 0  # only view 0 (target) masked
    assert len(item["txt"]) == 4
    assert "<view_direct-0-0>" in item["txt"][0]
    assert "<view_direct-3-1>" in item["txt"][3]

    # concat_target: (V-1) stitched canvases
    ds_ct = InpaintingMultiViewDataset(
        image_path=str(root / "image_dict.pkl"),
        pair_path=str(root / "mv_pairs.pkl"),
        mask_path=[str(root / "irregular.txt"), str(root / "segment.txt")],
        mode="train",
        view_mask_rate=0.0,
        view_num=4,
        view_token_len=2,
        concat_target=True,
        seed=0,
        **CFG,
    )
    item = ds_ct[0]
    assert item["image"].shape == (3, 32, 64, 3)
    assert item["mask"].shape == (3, 32, 64, 1)
    # target half identical across canvases
    assert np.allclose(item["image"][0, :, 32:], item["image"][1, :, 32:])
    assert len(item["txt"]) == 3


def test_test_dataset(fixture_root):
    root, _, _ = fixture_root
    ds = TestInpaintingDataset(root_path=str(root / "testpairs"), **CFG)
    item = ds[0]
    assert item["image"].shape == (32, 64, 3)
    assert item["mask"][:, :32].sum() == 0


def test_nvs_obj_dataset(fixture_root):
    root, _, _ = fixture_root
    ds = NVS_OBJDataset(
        datapath=str(root / "objs"),
        listfile=str(root / "objs.txt"),
        mode="train",
        img_size=32,
        nviews=4,
        seed=0,
        **{k: v for k, v in CFG.items() if k != "img_size"},
    )
    item = ds[0]
    assert item["image"].shape == (32, 64, 3)
    assert item["rel_pose"].shape == (4,)
    assert item["mask"][:, :32].sum() == 0  # left (cond) never masked
    # sin^2+cos^2 == 1 for the azimuth encoding
    assert abs(item["rel_pose"][1] ** 2 + item["rel_pose"][2] ** 2 - 1) < 1e-5


def test_get_relative_pose_identity():
    RT = np.concatenate([np.eye(3), np.array([[0.0], [0.0], [-2.0]])], axis=1)
    d = get_relative_pose(RT, RT)
    assert np.allclose(d, [0.0, 0.0, 1.0, 0.0], atol=1e-6)  # dφ=0 -> sin 0, cos 1


def test_balanced_sampler_rank_split(fixture_root):
    _, image_dict, pairs = fixture_root
    samplers = [
        BalancedRandomSampler(image_dict, pairs, n_sample_per_scene=4, rank=r, num_replicas=2)
        for r in range(2)
    ]
    for s in samplers:
        s.set_epoch(3)
    idx0, idx1 = list(iter(samplers[0])), list(iter(samplers[1]))
    assert len(idx0) == len(idx1) == 4  # 2 scenes * 4 / 2 ranks
    assert not set(idx0) & set(idx1)  # disjoint rank shards
    # same epoch on a FRESH sampler -> identical shard (the sampler itself is
    # stateful across __iter__ calls, mirroring the reference's in-place
    # shuffles, inpainting_crossview_dataset.py:808-811)
    fresh = BalancedRandomSampler(image_dict, pairs, n_sample_per_scene=4, rank=0, num_replicas=2)
    fresh.set_epoch(3)
    assert list(iter(fresh)) == idx0
    fresh2 = BalancedRandomSampler(image_dict, pairs, n_sample_per_scene=4, rank=0, num_replicas=2)
    fresh2.set_epoch(4)
    assert list(iter(fresh2)) != idx0


def test_loader_collate_and_tokens(fixture_root):
    from leftrefill_tpu.models.tokenizer import SimpleTokenizer

    root, _, _ = fixture_root
    ds = InpaintingCrossViewDataset(
        image_path=str(root / "image_dict.pkl"),
        pair_path=str(root / "pairs.pkl"),
        mask_path=[str(root / "irregular.txt"), str(root / "segment.txt")],
        mode="train",
        view_mask_rate=0.0,
        constant_place=True,
        seed=0,
        **CFG,
    )
    tok = SimpleTokenizer(special_tokens=[f"<special-token{i}>" for i in range(4)])
    loader = DataLoader(ds, batch_size=2, tokenizer=tok, num_workers=2)
    batch = next(iter(loader))
    assert batch["image"].shape == (2, 32, 64, 3)
    assert batch["tokens"].shape == (2, 77)
    assert batch["tokens"][0, 1] == 49408  # first special token after sot
    assert len(loader) == 5  # 10 pairs / batch 2


def test_flatten_views():
    b = {
        "image": np.zeros((2, 4, 8, 16, 3)),
        "tokens": np.zeros((2, 4, 77), np.int32),
        "mask": np.zeros((2, 4, 8, 16, 1)),
    }
    f = flatten_views(b)
    assert f["image"].shape == (8, 8, 16, 3)
    assert f["tokens"].shape == (8, 77)
