"""End-to-end text -> image sampling through the CLI: tiny on-disk WORD
dataset, one training epoch, then `sample` with novel captions."""

import os
import pickle

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    from PIL import Image

    from xmc_gan_tpu import cli

    root = tmp_path_factory.mktemp("ds")
    out_root = str(tmp_path_factory.mktemp("out"))
    n, cpi = 8, 5
    for mode in ("train", "test"):
        os.makedirs(root / mode)
    os.makedirs(root / "images")
    names = [f"img_{i:03d}" for i in range(n)]
    rng = np.random.RandomState(0)
    for name in names:
        Image.fromarray(rng.randint(0, 255, (80, 80, 3), np.uint8)).save(
            root / "images" / f"{name}.jpg"
        )
    for mode in ("train", "test"):
        with open(root / mode / "filenames.pickle", "wb") as f:
            pickle.dump(names, f)
    words = ["a", "red", "bird", "on", "tree", "blue", "dog", "runs"]
    i2w = {i + 1: w for i, w in enumerate(words)}
    i2w[0] = "<pad>"
    w2i = {w: i for i, w in i2w.items()}
    caps = [rng.randint(1, len(words) + 1, rng.randint(2, 6)).tolist()
            for _ in range(n * cpi)]
    with open(root / "captions.pickle", "wb") as f:
        pickle.dump((caps, caps, i2w, w2i), f)

    cfg_path = root / "tiny.yml"
    cfg_path.write_text(
        "CONFIG_NAME: TINY_CLI\n"
        "TRAIN:\n  NCH: 8\n  NEF: 32\n  NOISE_DIM: 16\n  HE_INIT: true\n"
        "  BATCH_SIZE: 4\n"
        "  ENCODER_LOSS:\n    SENT: true\n"
        "IMG:\n  SIZE: 64\n"
        "TEXT:\n  EMBEDDING_DIM: 48\n  MAX_LENGTH: 6\n  VOCA_SIZE: 9\n"
        "DISC:\n  IMG_MATCH: true\n"
    )
    rc = cli.main([
        "train", "--cfg", str(cfg_path), "--data_dir", str(root),
        "--max_epochs", "1", "--seed", "5", "--log_type", "none",
        "--output_root", out_root, "--save_after", "0", "--no_eval_fid",
    ])
    assert rc == 0
    return str(cfg_path), str(root), out_root


def test_sample_from_captions(tiny_run, tmp_path):
    from xmc_gan_tpu import cli

    cfg_path, data_dir, out_root = tiny_run
    out = str(tmp_path / "grid.png")
    rc = cli.main([
        "sample", "--cfg", cfg_path, "--data_dir", data_dir,
        "--output_root", out_root, "--seed", "5",
        "--caption", "a red bird", "--caption", "blue dog runs",
        "--n_per_caption", "2", "--out", out,
    ])
    assert rc == 0
    assert os.path.isfile(out)
    from PIL import Image

    img = np.asarray(Image.open(out))
    assert img.shape[0] > 64 and img.shape[1] > 64  # 2x2 grid of 64px tiles


def test_sample_rejects_oov_caption(tiny_run):
    from xmc_gan_tpu import cli

    cfg_path, data_dir, out_root = tiny_run
    with pytest.raises(ValueError, match="in-vocabulary"):
        cli.main([
            "sample", "--cfg", cfg_path, "--data_dir", data_dir,
            "--output_root", out_root, "--seed", "5",
            "--caption", "zebra quantum", "--out", "/tmp/x.png",
        ])
