"""Offline preprocessor tests with synthetic LoFTR-style scene-info npz
(reference: megadepth_overlap.py, extend_data_for_multiview.py)."""

import pickle

import numpy as np
import pytest

from leftrefill_tpu.data.preprocess import build_megadepth_pairs, extend_pairs_for_multiview


@pytest.fixture()
def scene_info(tmp_path):
    info = tmp_path / "scene_info"
    info.mkdir()
    image_paths = np.array([f"phoenix/0001/imgs/im{i}.jpg" for i in range(6)], dtype=object)
    pair_infos = np.array(
        [
            ((0, 1), 0.5, None),
            ((1, 2), 0.65, None),
            ((2, 3), 0.9, None),   # above overlap hi -> filtered from train
            ((3, 4), 0.2, None),   # below overlap lo -> filtered from train
            ((4, 5), 0.45, None),
            ((0, 2), 0.3, None),
        ],
        dtype=object,
    )
    np.savez(info / "scene0.npz", pair_infos=pair_infos, image_paths=image_paths)
    return tmp_path, info


def test_build_megadepth_pairs(scene_info):
    root, info = scene_info
    out = root / "out"
    stats = build_megadepth_pairs(
        root_path="data/megadepth",
        train_info_path=str(info),
        test_info_path=str(info),
        out_path=str(out),
        overlap=(0.4, 0.7),
    )
    assert stats["train_pairs"] == 3  # 0.5, 0.65, 0.45
    assert stats["test_pairs"] == 6  # test keeps all
    with open(out / "image_dict.pkl", "rb") as f:
        image_dict = pickle.load(f)
    assert all(p.startswith("data/megadepth/") for p in image_dict.values())
    with open(out / "train_pairs.pkl", "rb") as f:
        pairs = pickle.load(f)
    assert set(pairs[0]) == {"source", "target", "prompt"}


def test_extend_pairs_for_multiview(scene_info, tmp_path):
    root, info = scene_info
    out = root / "out2"
    build_megadepth_pairs("data/megadepth", str(info), str(info), str(out), (0.0, 1.0))
    with open(out / "image_dict.pkl", "rb") as f:
        image_dict = pickle.load(f)
    with open(out / "train_pairs.pkl", "rb") as f:
        pairs = pickle.load(f)
    extended = extend_pairs_for_multiview(
        str(info), pairs, image_dict, str(tmp_path / "ext.pkl"), extra_views=2, min_overlap=0.2
    )
    assert len(extended) == len(pairs)
    e0 = extended[0]
    assert set(e0) == {"target", "source", "idx"}
    assert isinstance(e0["source"], list) and isinstance(e0["target"], list)
    # primary source always first
    assert e0["source"][0] == pairs[0]["source"]
    # extra views sorted by overlap and above min_overlap
    assert len(e0["source"]) <= 3
