"""Data-pipeline tests: on-disk format compatibility, augmentation semantics,
sharding invariants, determinism (SURVEY.md §2 rows 13-14)."""

import os
import pickle

import numpy as np
import pytest

from xmc_gan_tpu.config import cfg_from_dict
from xmc_gan_tpu.data import (
    DataLoader,
    SentTextDataset,
    SyntheticDataset,
    WordTextDataset,
    index_to_sent,
)


@pytest.fixture(scope="module")
def disk_dataset(tmp_path_factory):
    """Tiny dataset in the reference on-disk format (dataset.py:43-101)."""
    from PIL import Image

    root = tmp_path_factory.mktemp("coco")
    n, cpi = 6, 5
    os.makedirs(root / "train")
    os.makedirs(root / "test")
    os.makedirs(root / "images")
    names = [f"img_{i:03d}" for i in range(n)]
    rng = np.random.RandomState(0)
    for name in names:
        arr = rng.randint(0, 255, (90, 70, 3), np.uint8)
        Image.fromarray(arr).save(root / "images" / f"{name}.jpg")
    for mode in ("train", "test"):
        with open(root / mode / "filenames.pickle", "wb") as f:
            pickle.dump(names, f)

    i2w = {i: f"w{i}" for i in range(40)}
    w2i = {v: k for k, v in i2w.items()}
    caps = [rng.randint(1, 40, rng.randint(2, 12)).tolist() for _ in range(n * cpi)]
    with open(root / "captions.pickle", "wb") as f:
        pickle.dump((caps, caps, i2w, w2i), f)
    sents = [f"sentence number {i} here" for i in range(n * cpi)]
    with open(root / "bert_captions.pickle", "wb") as f:
        pickle.dump((sents, sents), f)
    return str(root), names, caps, sents


def _cfg(size=64, max_len=8):
    return cfg_from_dict(
        {"IMG": {"SIZE": size},
         "TEXT": {"MAX_LENGTH": max_len, "CAPTIONS_PER_IMAGE": 5, "VOCA_SIZE": 40}}
    )


def test_word_dataset_format_and_caption_selection(disk_dataset):
    root, names, caps, _ = disk_dataset
    ds = WordTextDataset(root, "train", _cfg())
    assert len(ds) == len(names)
    ex = ds[(2, 0, 0)]
    assert ex["imgs"].shape == (64, 64, 3)
    # uint8 through the wire; [-1,1] normalization happens on device
    assert ex["imgs"].dtype == np.uint8
    assert ex["keys"] == names[2]
    # fixed sent_ix=1 quirk: caption index = idx*caps_per_image + 1
    want = np.asarray(caps[2 * 5 + 1], np.int64)
    L = min(len(want), 8)
    assert ex["cap_lens"] == L
    np.testing.assert_array_equal(ex["caps"][:L], want[:L])
    assert (ex["caps"][L:] == 0).all()
    assert ex["caps"].shape == (8,)


def test_sent_dataset_and_index_to_sent(disk_dataset):
    root, _, caps, sents = disk_dataset
    ds = SentTextDataset(root, "test", _cfg())
    ex = ds[(0, 0, 0)]
    assert ex["caps"] == sents[1]
    assert ex["cap_lens"] == len(sents[1].split(" "))
    # test mode: exact resize, no crop randomness
    ex2 = ds[(0, 3, 7)]
    np.testing.assert_array_equal(ex["imgs"], ex2["imgs"])

    i2w = {i: f"w{i}" for i in range(40)}
    got = index_to_sent(i2w, np.array([[3, 4, 0, 0]]))
    assert got == ["w3 w4"]


def test_train_augmentation_deterministic_per_key(disk_dataset):
    root, _, _, _ = disk_dataset
    ds = WordTextDataset(root, "train", _cfg())
    a = ds[(1, 0, 123)]["imgs"]
    b = ds[(1, 0, 123)]["imgs"]
    c = ds[(1, 1, 123)]["imgs"]
    np.testing.assert_array_equal(a, b)  # stateless: same (seed, epoch, idx)
    assert not np.array_equal(a, c)  # new epoch -> new crop/flip


def test_loader_sharding_partitions_epoch(disk_dataset):
    root, names, _, _ = disk_dataset
    ds = WordTextDataset(root, "train", _cfg())
    seen = []
    for host in range(2):
        loader = DataLoader(
            ds, batch_size=4, shuffle=True, drop_last=False, seed=5,
            shard=(host, 2), num_threads=2,
        )
        for batch in loader:
            seen.extend(batch["keys"])
    assert sorted(seen) == sorted(names)  # disjoint union = one epoch

    # drop_last: identical batch count on every host
    l0 = DataLoader(ds, 4, drop_last=True, shard=(0, 2))
    l1 = DataLoader(ds, 4, drop_last=True, shard=(1, 2))
    assert len(l0) == len(l1) == 1
    b0 = next(iter(l0))
    assert b0["imgs"].shape == (2, 64, 64, 3)  # local slice of global batch 4


def test_loader_shuffle_determinism_and_epoch_reshuffle(disk_dataset):
    root, _, _, _ = disk_dataset
    ds = WordTextDataset(root, "train", _cfg())
    loader = DataLoader(ds, 6, shuffle=True, drop_last=True, seed=9)
    first = [b["keys"] for b in loader]
    again = [b["keys"] for b in loader]
    assert first == again
    loader.set_epoch(1)
    other = [b["keys"] for b in loader]
    assert first != other


def test_loader_batches_invariant_to_thread_count(disk_dataset):
    """Thread count is a throughput knob, never a semantics knob: per-example
    augmentation RNG is a pure function of (index, epoch, seed) and batches
    are emitted strictly in order, so any num_threads yields bitwise-identical
    batches (this is also what makes crash-resume exact on any host size)."""
    root, _, _, _ = disk_dataset
    ds = WordTextDataset(root, "train", _cfg())
    loaders = [
        DataLoader(ds, 4, shuffle=True, drop_last=True, seed=3, num_threads=n)
        for n in (1, 2, 5)
    ]
    for ld in loaders:
        ld.set_epoch(2)
    ref = list(loaders[0])
    for ld in loaders[1:]:
        got = list(ld)
        assert len(got) == len(ref)
        for a, b in zip(ref, got):
            assert a.keys() == b.keys()
            for k in a:
                np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_synthetic_dataset_smoke():
    ds = SyntheticDataset(_cfg(size=32, max_len=6), length=10)
    loader = DataLoader(ds, 4, shuffle=True, drop_last=True, seed=0)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["imgs"].shape == (4, 32, 32, 3)
    assert b["caps"].shape == (4, 6)
    assert b["cap_lens"].min() >= 3


def test_synthetic_train_and_test_splits_are_distinct():
    """The Trainer passes the same seed to both loaders; without a per-split
    salt, synthetic test example i would be bit-identical to train example i
    and smoke FID would measure train-set memorization."""
    cfg = _cfg(size=16, max_len=5)
    train = SyntheticDataset(cfg, length=8, mode="train")
    test = SyntheticDataset(cfg, length=8, mode="test")
    tr = train[(0, 0, 0)]
    te = test[(0, 0, 0)]
    assert not np.array_equal(tr["imgs"], te["imgs"])
    assert tr["keys"] != te["keys"]
    # determinism within a split is unchanged
    assert np.array_equal(tr["imgs"], train[(0, 0, 0)]["imgs"])


def test_loader_first_batch_matches_iteration_and_keeps_start_batch():
    ds = SyntheticDataset(_cfg(size=8, max_len=3), length=12)
    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=0, num_threads=1)
    loader.set_epoch(1, start_batch=2)
    fb = loader.first_batch()
    # first_batch is the epoch's batch 0 regardless of (and not consuming)
    # the pending start_batch skip
    assert len(list(loader)) == 1  # the skip still applies to the next pass
    loader.set_epoch(1)
    it = next(iter(loader))
    for k in ("imgs", "caps", "cap_lens"):
        assert np.array_equal(fb[k], it[k]), k


def test_loader_start_batch_applies_to_one_pass_only():
    ds = SyntheticDataset(_cfg(size=8, max_len=3), length=12)
    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=0, num_threads=1)
    loader.set_epoch(1, start_batch=2)
    assert len(list(loader)) == 1  # 3 batches, 2 skipped
    # the skip is consumed: a second pass over the same epoch is full
    assert len(list(loader)) == 3
