"""Localized Narratives ingestion (BASELINE configs #4/#5): JSONL prep ->
reference-compatible layout -> SentTextDataset -> full LN-shaped training
(MAX_LENGTH=200, WORD loss on) through the Trainer."""

import json
import os
import pickle

import numpy as np
import pytest

from xmc_gan_tpu.config import cfg_from_dict
from xmc_gan_tpu.data.ln_prep import prepare_localized_narratives, read_ln_jsonl
from xmc_gan_tpu.data.pipeline import SentTextDataset

pytestmark = pytest.mark.slow


def _write_jsonl(path, records):
    with open(path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


def _ln_records(split, n, extra_for=()):
    recs = []
    for i in range(n):
        image_id = str(1000 + i) if split == "train" else str(2000 + i)
        recs.append({
            "dataset_id": f"mscoco_{split}2017",
            "image_id": image_id,
            "annotator_id": 90 + i,
            "caption": f"{split} narration for image {image_id} with details",
            "timed_caption": [],
            "traces": [],
            "voice_recording": f"coco_{split}/{image_id}.ogg",
        })
        if i in extra_for:  # second narration for the same image
            recs.append({
                "dataset_id": f"mscoco_{split}2017",
                "image_id": image_id,
                "annotator_id": 900,
                "caption": f"second narration for {image_id}",
            })
    return recs


def _write_images(data_dir, keys, size=32):
    from PIL import Image

    os.makedirs(f"{data_dir}/images", exist_ok=True)
    rng = np.random.RandomState(0)
    for key in keys:
        arr = rng.randint(0, 255, (size, size, 3), np.uint8)
        Image.fromarray(arr).save(f"{data_dir}/images/{key}.jpg")


def test_prep_ln_layout_and_dataset_roundtrip(tmp_path):
    data_dir = str(tmp_path)
    _write_jsonl(f"{data_dir}/train.jsonl", _ln_records("train", 6, extra_for=(2,)))
    _write_jsonl(f"{data_dir}/test.jsonl", _ln_records("test", 3))

    counts = prepare_localized_narratives(
        data_dir, f"{data_dir}/train.jsonl", f"{data_dir}/test.jsonl",
        caps_per_image=1,
    )
    assert counts == {"train": 6, "test": 3}

    with open(f"{data_dir}/train/filenames.pickle", "rb") as f:
        keys = pickle.load(f)
    assert keys == [str(1000 + i) for i in range(6)]
    with open(f"{data_dir}/bert_captions.pickle", "rb") as f:
        train_sents, test_sents = pickle.load(f)
    # one caption slot per image; the image with two narrations keeps its first
    assert len(train_sents) == 6 and len(test_sents) == 3
    assert train_sents[2] == "train narration for image 1002 with details"

    _write_images(data_dir, keys + [str(2000 + i) for i in range(3)])
    cfg = cfg_from_dict({
        "TEXT": {"TYPE": "SENT", "CAPTIONS_PER_IMAGE": 1, "MAX_LENGTH": 200},
        "IMG": {"SIZE": 32},
    })
    ds = SentTextDataset(data_dir, "train", cfg)
    ex = ds[(4, 0, 0)]
    # caps_per_image=1 must map image idx -> its OWN caption (sent_ix clamps
    # to 0; the reference's fixed sent_ix=1 is a 5-captions-per-image quirk)
    assert ex["caps"] == train_sents[4] and "1004" in ex["caps"]
    assert ex["cap_idx"] == 4 and ex["keys"] == "1004"
    assert ex["imgs"].shape == (32, 32, 3)
    # last image must not overflow the caption list
    last = ds[(5, 0, 0)]
    assert last["cap_idx"] == 5

    # multi-caption layouts keep the reference's fixed second-caption quirk
    prepare_localized_narratives(
        data_dir, f"{data_dir}/train.jsonl", f"{data_dir}/test.jsonl",
        caps_per_image=5,
    )
    cfg5 = cfg_from_dict({
        "TEXT": {"TYPE": "SENT", "CAPTIONS_PER_IMAGE": 5, "MAX_LENGTH": 200},
        "IMG": {"SIZE": 32},
    })
    ds5 = SentTextDataset(data_dir, "train", cfg5)
    assert ds5[(2, 0, 0)]["cap_idx"] == 2 * 5 + 1  # sent_ix = 1
    assert ds5[(2, 0, 0)]["caps"] == "second narration for 1002"


def test_read_ln_jsonl_key_format():
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        _write_jsonl(f"{d}/t.jsonl", _ln_records("train", 2))
        _write_jsonl(f"{d}/v.jsonl", _ln_records("test", 1))
        by_image = read_ln_jsonl(f"{d}/t.jsonl")
        assert list(by_image) == ["1000", "1001"]
        prepare_localized_narratives(
            d, f"{d}/t.jsonl", f"{d}/v.jsonl",
            key_format="COCO_train2014_{:012d}",
        )
        with open(f"{d}/train/filenames.pickle", "rb") as f:
            keys = pickle.load(f)
        assert keys[0] == "COCO_train2014_000000001000"


def test_ln_shaped_training_end_to_end(tmp_path):
    """The LN slice end-to-end: prep -> fabricated SBERT cache -> Trainer fit
    with MAX_LENGTH=200 + WORD loss + B_GLOBAL, finite losses out."""
    import jax

    from xmc_gan_tpu.trainer import Trainer

    data_dir = str(tmp_path)
    _write_jsonl(f"{data_dir}/train.jsonl", _ln_records("train", 8))
    _write_jsonl(f"{data_dir}/test.jsonl", _ln_records("test", 4))
    prepare_localized_narratives(
        data_dir, f"{data_dir}/train.jsonl", f"{data_dir}/test.jsonl",
        caps_per_image=1,
    )
    with open(f"{data_dir}/train/filenames.pickle", "rb") as f:
        train_keys = pickle.load(f)
    with open(f"{data_dir}/test/filenames.pickle", "rb") as f:
        test_keys = pickle.load(f)
    _write_images(data_dir, train_keys + test_keys, size=64)

    # fabricated SBERT token-embedding caches at a test-sized embedding dim
    rng = np.random.RandomState(1)
    for mode, n in (("train", 8), ("test", 4)):
        attn = np.zeros((n, 200), np.uint8)
        for i in range(n):
            attn[i, : 30 + 15 * i] = 1
        np.savez(
            f"{data_dir}/sbert_cache_{mode}.npz",
            token_embs=rng.randn(n, 200, 24).astype(np.float16),
            attn_mask=attn,
        )

    cfg = cfg_from_dict({
        "DATASET_NAME": "ln_tiny",
        "TRAIN": {
            "BATCH_SIZE": 4, "NCH": 4, "NEF": 16, "NOISE_DIM": 8,
            "RMIS_LOSS": True, "MAGP": True, "N_CRITIC": 1,
            "ENCODER_LOSS": {"B_GLOBAL": True, "SENT": True, "WORD": True,
                             "DISC": True},
            "SMOOTH": {"GLOBAL": 0.0},
        },
        "IMG": {"SIZE": 64},
        "TEXT": {"TYPE": "SENT", "ENCODER_NAME": "SBERT",
                 "CAPTIONS_PER_IMAGE": 1, "MAX_LENGTH": 200,
                 "EMBEDDING_DIM": 24, "BERT_NORM": True},
        "DISC": {"SPEC_NORM": True, "IMG_MATCH": True},
    })
    trainer = Trainer(
        cfg, seed=0, data_dir=data_dir, output_root=str(tmp_path / "out"),
        log_type="none", eval_fid=False, save_after=10**9, num_threads=2,
    )
    metrics = trainer.fit(max_epochs=1)
    assert {"ds_word", "gs_word"} <= set(metrics)
    for k, v in metrics.items():
        assert np.isfinite(v), (k, v)
