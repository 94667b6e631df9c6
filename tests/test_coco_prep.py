"""COCO ingestion: raw captions_{train,val}2014.json -> reference-compatible
pickles (the producer the reference lacks; it inherits AttnGAN's artifacts,
reference ``dataset.py:82-113``) -> WordTextDataset/SentTextDataset round-trip.
"""

import json
import os
import pickle

import numpy as np
import pytest

from xmc_gan_tpu.config import cfg_from_dict
from xmc_gan_tpu.data.coco_prep import (
    build_vocabulary,
    encode_captions,
    prepare_coco,
    read_coco_annotations,
    tokenize_caption,
)
from xmc_gan_tpu.data.pipeline import SentTextDataset, WordTextDataset


def _coco_json(path, split, n_images, caps, start_id=0):
    """Minimal official-schema COCO caption annotation file.  ``caps`` maps
    image index -> list of captions (missing index -> no annotations)."""
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        img_id = start_id + i
        images.append({
            "id": img_id,
            "file_name": f"COCO_{split}2014_{img_id:012d}.jpg",
            "height": 32, "width": 32,
        })
        for cap in caps.get(i, []):
            annotations.append({"id": ann_id, "image_id": img_id, "caption": cap})
            ann_id += 1
    with open(path, "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)


def _write_images(data_dir, keys, size=32):
    from PIL import Image

    os.makedirs(f"{data_dir}/images", exist_ok=True)
    rng = np.random.RandomState(0)
    for key in keys:
        arr = rng.randint(0, 255, (size, size, 3), np.uint8)
        Image.fromarray(arr).save(f"{data_dir}/images/{key}.jpg")


def test_tokenize_caption_attngan_rules():
    # lowercase + \w+ + ascii-ignore, matching AttnGAN's load_captions
    assert tokenize_caption("A man, riding; a SKATEBOARD!") == [
        "a", "man", "riding", "a", "skateboard"]
    # the �� replacement-char pair becomes a separator
    assert tokenize_caption("café��shop") == ["caf", "shop"]
    # fully non-ascii tokens drop; digits are \w
    assert tokenize_caption("éé 42 dogs") == ["42", "dogs"]
    assert tokenize_caption("   ") == []


def test_build_vocabulary_order_and_end_token():
    i2w, w2i = build_vocabulary([["a", "dog"], ["dog", "runs"]])
    assert i2w == {0: "<end>", 1: "a", 2: "dog", 3: "runs"}
    assert w2i == {"<end>": 0, "a": 1, "dog": 2, "runs": 3}
    # encoding never produces token 0 (the reference's get_caption asserts
    # no END token appears, dataset.py:104-105)
    enc = encode_captions([["dog", "runs"], ["a"]], w2i)
    assert enc == [[2, 3], [1]]
    assert all(0 not in cap for cap in enc)


def test_prepare_coco_layout_and_dataset_roundtrip(tmp_path):
    data_dir = str(tmp_path)
    train_caps = {
        0: ["A red dog runs", "The dog is red", "Dog running fast",
            "Red animal in motion", "A running dog", "Sixth extra caption"],
        1: ["Blue cat sits"],  # fewer than 5 -> repeats last
        2: [],                 # no captions -> image dropped
    }
    test_caps = {0: ["Green bird flies", "Bird in the sky"]}
    _coco_json(f"{data_dir}/train.json", "train", 3, train_caps, start_id=10)
    _coco_json(f"{data_dir}/val.json", "val", 1, test_caps, start_id=90)

    summary = prepare_coco(
        data_dir, f"{data_dir}/train.json", f"{data_dir}/val.json",
        caps_per_image=5,
    )
    assert summary["train_images"] == 2 and summary["dropped_train"] == 1
    assert summary["test_images"] == 1

    # artifact shapes: byte-level format the reference reads
    with open(f"{data_dir}/train/filenames.pickle", "rb") as f:
        train_keys = pickle.load(f)
    assert train_keys == [f"COCO_train2014_{10:012d}", f"COCO_train2014_{11:012d}"]
    with open(f"{data_dir}/captions.pickle", "rb") as f:
        train_enc, test_enc, i2w, w2i = pickle.load(f)[:4]
    assert len(train_enc) == 2 * 5 and len(test_enc) == 1 * 5
    assert i2w[0] == "<end>" and all(0 not in c and len(c) > 0 for c in train_enc)
    # sixth caption dropped; short image repeats its last caption
    with open(f"{data_dir}/bert_captions.pickle", "rb") as f:
        train_sents, test_sents = pickle.load(f)[:2]
    assert train_sents[:5] == train_caps[0][:5]
    assert train_sents[5:10] == ["Blue cat sits"] * 5

    # round-trip through both dataset classes (fixed sent_ix=1 semantics)
    _write_images(data_dir, train_keys + [f"COCO_val2014_{90:012d}"])
    cfg = cfg_from_dict({
        "IMG": {"SIZE": 32},
        "TEXT": {"CAPTIONS_PER_IMAGE": 5, "MAX_LENGTH": 12,
                 "VOCA_SIZE": len(i2w)},
    })
    word_ds = WordTextDataset(data_dir, "train", cfg)
    assert len(word_ds) == 2 and word_ds.voca_size == len(i2w)
    ex = word_ds[0]
    assert ex["imgs"].shape == (32, 32, 3)
    # sent_ix=1 -> the image's second caption
    want = encode_captions([tokenize_caption(train_caps[0][1])], w2i)[0]
    assert list(ex["caps"][: ex["cap_lens"]]) == want

    sent_ds = SentTextDataset(data_dir, "test", cfg)
    ex = sent_ds[0]
    assert ex["caps"] == "Bird in the sky"  # second caption of the only image


def test_prepare_coco_vocab_from_reuses_indices(tmp_path):
    """--vocab_from keeps an existing AttnGAN-style vocabulary index-exact and
    drops OOV tokens, so pre-trained DAMSM embeddings stay aligned."""
    data_dir = str(tmp_path)
    _coco_json(f"{data_dir}/t.json", "train", 1, {0: ["a dog runs"] * 5})
    _coco_json(f"{data_dir}/v.json", "val", 1, {0: ["a dog sits"] * 5}, start_id=9)

    # existing vocabulary with its own (shuffled) index assignment; 'sits' OOV
    i2w = {0: "<end>", 1: "runs", 2: "a", 3: "dog"}
    w2i = {w: i for i, w in i2w.items()}
    vocab_path = f"{data_dir}/old_captions.pickle"
    with open(vocab_path, "wb") as f:
        pickle.dump([[], [], i2w, w2i], f)

    summary = prepare_coco(
        data_dir, f"{data_dir}/t.json", f"{data_dir}/v.json",
        caps_per_image=5, vocab_from=vocab_path,
    )
    assert summary["voca_size"] == 4
    with open(f"{data_dir}/captions.pickle", "rb") as f:
        train_enc, test_enc, got_i2w, _ = pickle.load(f)[:4]
    assert got_i2w == i2w
    assert train_enc[0] == [2, 3, 1]  # a dog runs, old indices
    assert test_enc[0] == [2, 3]      # 'sits' dropped as OOV


def test_prepare_coco_vocab_from_never_writes_empty_captions(tmp_path):
    """An all-OOV caption must count as invalid under --vocab_from: validity
    is judged on the encoded result, so captions.pickle never contains an
    empty caption (the no-empty-caption invariant the reference's
    get_caption relies on) and the caps_per_image layout stays aligned."""
    data_dir = str(tmp_path)
    train_caps = {
        # caption 1 is entirely OOV under the old vocab -> must be replaced
        # by a valid one, not encoded to []
        0: ["a dog runs", "zebra xylophone", "a dog runs",
            "a dog runs", "a dog runs"],
        # every caption all-OOV -> the image itself drops
        1: ["zebra xylophone"] * 5,
    }
    _coco_json(f"{data_dir}/t.json", "train", 2, train_caps)
    _coco_json(f"{data_dir}/v.json", "val", 1, {0: ["a dog"] * 5}, start_id=9)

    i2w = {0: "<end>", 1: "a", 2: "dog", 3: "runs"}
    w2i = {w: i for i, w in i2w.items()}
    vocab_path = f"{data_dir}/old_captions.pickle"
    with open(vocab_path, "wb") as f:
        pickle.dump([[], [], i2w, w2i], f)

    summary = prepare_coco(
        data_dir, f"{data_dir}/t.json", f"{data_dir}/v.json",
        caps_per_image=5, vocab_from=vocab_path,
    )
    assert summary["train_images"] == 1 and summary["dropped_train"] == 1
    with open(f"{data_dir}/captions.pickle", "rb") as f:
        train_enc, test_enc, _, _ = pickle.load(f)[:4]
    assert len(train_enc) == 1 * 5 and len(test_enc) == 1 * 5
    assert all(len(c) > 0 and 0 not in c for c in train_enc + test_enc)
    # slot 1's all-OOV caption was backfilled with a valid neighbour
    assert train_enc[1] == [1, 2, 3]


def test_prep_coco_cli(tmp_path):
    from xmc_gan_tpu.cli import main

    data_dir = str(tmp_path)
    _coco_json(f"{data_dir}/t.json", "train", 2, {0: ["one cap"], 1: ["two cap"]})
    _coco_json(f"{data_dir}/v.json", "val", 1, {0: ["three cap"]}, start_id=5)
    rc = main([
        "prep-coco", "--data_dir", data_dir,
        "--train_json", f"{data_dir}/t.json",
        "--test_json", f"{data_dir}/v.json",
        "--caps_per_image", "5",
    ])
    assert rc == 0
    for artifact in ("train/filenames.pickle", "test/filenames.pickle",
                     "captions.pickle", "bert_captions.pickle"):
        assert os.path.isfile(os.path.join(data_dir, artifact))
