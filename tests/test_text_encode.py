"""Precomputed-SBERT pipeline: cache reader + the SENT encode path end-to-end
(cache built synthetically — the HF model itself is gated on local weights)."""

import numpy as np
import pytest

from xmc_gan_tpu.config import cfg_from_dict
from xmc_gan_tpu.data.text_encode import SbertCache
from xmc_gan_tpu.trainer import make_encode_fn


@pytest.fixture()
def cache_dir(tmp_path):
    rng = np.random.RandomState(0)
    for mode, n in (("train", 30), ("test", 10)):
        np.savez(
            tmp_path / f"sbert_cache_{mode}.npz",
            token_embs=rng.randn(n, 8, 16).astype(np.float16),
            attn_mask=(rng.rand(n, 8) > 0.3).astype(np.uint8),
        )
    return str(tmp_path)


def test_sbert_cache_reader(cache_dir):
    cache = SbertCache(cache_dir, "train")
    assert len(cache) == 30
    tok, attn = cache([3, 7, 7])
    assert tok.shape == (3, 8, 16) and tok.dtype == np.float32
    assert attn.shape == (3, 8) and attn.dtype == np.int32
    np.testing.assert_array_equal(tok[1], tok[2])

    with pytest.raises(FileNotFoundError, match="build_sbert_cache"):
        SbertCache(cache_dir + "/nope", "train")


def test_sent_encode_fn_uses_cache(cache_dir):
    cfg = cfg_from_dict({
        "TEXT": {"ENCODER_NAME": "SBERT", "TYPE": "SENT",
                 "EMBEDDING_DIM": 16, "MAX_LENGTH": 8},
    })
    encode = make_encode_fn(cfg, synthetic=False, data_dir=cache_dir)
    batch = {"cap_idx": np.array([1, 4, 9]), "mode": ["test", "test", "test"]}
    words, sent, mask = encode(batch)
    assert words.shape == (3, 8, 16)
    assert sent.shape == (3, 16)
    assert mask.shape == (3, 8)
    # pooling parity: masked mean of cached embeddings
    cache = SbertCache(cache_dir, "test")
    tok, attn = cache([1, 4, 9])
    want = (tok * attn[..., None]).sum(1) / attn.sum(1, keepdims=True)
    np.testing.assert_allclose(np.asarray(sent), want, rtol=1e-4, atol=1e-5)
