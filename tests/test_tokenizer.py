"""Tokenizer + prompt-token semantics tests
(reference: Refill_modules.py:59-130, open_clip SimpleTokenizer)."""

import numpy as np
import pytest

from leftrefill_tpu.models.tokenizer import (
    CLIP_VOCAB_SIZE,
    SimpleTokenizer,
    expand_special_tokens,
)


@pytest.fixture(scope="module")
def tok():
    sp, _ = expand_special_tokens(["repeat_50_<special-token>"], ["init text"])
    return SimpleTokenizer(special_tokens=sp), sp


def test_repeat_expansion():
    sp, init = expand_special_tokens(
        ["repeat_50_<special-token>"], ["The whole image ..."]
    )
    assert len(sp) == 50 and len(init) == 50
    assert sp[0] == "<special-token0>"
    assert sp[49] == "<special-token49>"


def test_deep_prompt_expansion():
    sp, init = expand_special_tokens(
        ["repeat_2_<special-token>"], ["x"], deep_prompt=True, cross_attn_layers=3
    )
    assert len(sp) == 6
    assert sp[0] == "<special-token0-layer0>"
    assert sp[5] == "<special-token1-layer2>"


def test_special_ids_above_vocab(tok):
    t, sp = tok
    assert t.sot_token == 49406
    assert t.eot_token == 49407
    ids = t.encode("<special-token0> <special-token49>")
    assert ids[0] == CLIP_VOCAB_SIZE  # first special token
    assert ids[1] == CLIP_VOCAB_SIZE + 49


def test_tokenize_shape_and_framing(tok):
    t, _ = tok
    arr = t.tokenize(["a photo", "<special-token0>" * 100])
    assert arr.shape == (2, 77)
    assert arr[0, 0] == t.sot_token
    # row 0: sot, tokens, eot, zero padding
    eot_pos = int(np.argmax(arr[0] == t.eot_token))
    assert arr[0, eot_pos + 1 :].sum() == 0
    # row 1 overflows: truncated with eot forced last
    assert arr[1, -1] == t.eot_token
    assert (arr[1] != 0).all()


def test_prompt_string_of_50_tokens(tok):
    """The canonical LeftRefill prompt: 50 repeated special tokens fits in 77
    (ref_inpainting_gradio.py:191-193)."""
    t, sp = tok
    prompt = " ".join(sp)
    ids = t.encode(prompt)
    assert len(ids) == 50
    assert ids == list(range(CLIP_VOCAB_SIZE, CLIP_VOCAB_SIZE + 50))


def test_roundtrip_ascii(tok):
    t, _ = tok
    ids = t.encode("hello world")
    assert len(ids) > 0
    dec = t.decode(ids)
    assert "hello" in dec and "world" in dec


def test_multiview_token_missing_bracket_quirk():
    """The multiview view tokens lack the closing '>' (multiview_Refill_modules.py
    :136-141) — must still tokenize as single specials."""
    sp = [f"<view_direct-{j}-{l}" for j in range(2) for l in range(3)]
    t = SimpleTokenizer(special_tokens=sp)
    ids = t.encode("<view_direct-0-0 <view_direct-1-2")
    assert ids == [CLIP_VOCAB_SIZE, CLIP_VOCAB_SIZE + 5]


def test_real_bpe_merges_file(tmp_path):
    """The bpe_path branch (exact-OpenCLIP mode) with a handcrafted merges
    file: merges apply by rank, merged tokens get ids after the 512 byte
    tokens, and sot/eot stay at the OpenCLIP control slots 49406/49407."""
    import gzip

    merges = "#version: 0.2\nh e\nl l\nhe ll\nhell o</w>\n"
    path = tmp_path / "merges.txt.gz"
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write(merges)

    tok = SimpleTokenizer(bpe_path=str(path), special_tokens=["<sp0>"])
    assert tok._parity is True
    # vocab layout: 256 bytes + 256 byte</w> + merges in rank order
    assert tok.encoder["he"] == 512
    assert tok.encoder["ll"] == 513
    assert tok.encoder["hell"] == 514
    assert tok.encoder["hello</w>"] == 515
    assert tok.sot_token == 49406 and tok.eot_token == 49407
    assert tok.encoder["<sp0>"] == 49408  # extended specials after the table

    ids = tok.tokenize("hello")[0]
    assert ids[0] == tok.sot_token
    assert ids[1] == 515  # fully merged by the 4 ranked merges
    assert ids[2] == tok.eot_token
    # an unmergeable word stays byte tokens (+</w> on the last)
    ids2 = tok.tokenize("xy")[0]
    assert ids2[1] == tok.encoder["x"]
    assert ids2[2] == tok.encoder["y</w>"]
