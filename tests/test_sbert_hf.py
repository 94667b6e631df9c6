"""Executable SBERT transformer path (VERDICT r1 next-round #5).

The reference runs ``SentenceTransformer('stsb-roberta-base')`` inside the
train loop (``/root/reference/xmc_gan/model/encoder.py:25-70``); this repo
encodes offline via ``make_hf_sbert_encode``/``build_sbert_cache``.  Those
functions were previously gated on hub weights this environment cannot fetch
— here a **tiny deterministic RoBERTa checkpoint** (byte-level tokenizer +
seeded torch weights, built fully offline) makes the whole
tokenize -> RoBERTa -> pool -> cache path executable, with parity checked
against an independent torch transliteration of the reference forward.
"""

import os
import json
import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from xmc_gan_tpu.config import cfg_from_dict
from xmc_gan_tpu.data.text_encode import (
    SbertCache,
    build_sbert_cache,
    make_hf_sbert_encode,
)

pytestmark = pytest.mark.slow

MAX_LEN = 16
HIDDEN = 32

SENTS = [
    "a red bird sits on a branch",
    "two dogs playing in the snow",
    "a red bird sits on a branch near water",
    "the kitchen has a white stove",
    "a plate of food",
]


def _bytes_to_unicode():
    """GPT-2 byte<->unicode table (public algorithm) for the byte-level BPE
    vocab; inlined so the test does not depend on a private transformers
    helper path."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


@pytest.fixture(scope="module")
def tiny_roberta_dir(tmp_path_factory):
    """A complete save_pretrained directory: byte-level RoBERTa tokenizer
    (empty merges — every token is one byte symbol) + seeded tiny torch
    RobertaModel."""
    d = tmp_path_factory.mktemp("tiny_roberta")
    specials = ["<s>", "<pad>", "</s>", "<unk>", "<mask>"]
    vocab = {tok: i for i, tok in enumerate(specials)}
    for ch in _bytes_to_unicode().values():
        vocab.setdefault(ch, len(vocab))
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")

    tokenizer = transformers.RobertaTokenizer(
        vocab_file=str(d / "vocab.json"), merges_file=str(d / "merges.txt")
    )
    tokenizer.save_pretrained(str(d))

    config = transformers.RobertaConfig(
        vocab_size=len(vocab),
        hidden_size=HIDDEN,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        max_position_embeddings=MAX_LEN + 8,
        pad_token_id=1,
        bos_token_id=0,
        eos_token_id=2,
        type_vocab_size=1,
    )
    torch.manual_seed(0)
    model = transformers.RobertaModel(config)
    model.eval()
    # pytorch_model.bin (not safetensors) so FlaxRobertaModel(from_pt=True)
    # exercises the torch->flax weight conversion
    model.save_pretrained(str(d), safe_serialization=False)
    return str(d)


@pytest.fixture(scope="module")
def cfg():
    return cfg_from_dict({
        "TEXT": {
            "ENCODER_NAME": "SBERT", "TYPE": "SENT",
            "EMBEDDING_DIM": HIDDEN, "MAX_LENGTH": MAX_LEN,
            "POOLING_MODE": "MEAN", "BERT_NORM": False,
        },
    })


def _torch_reference_forward(model_dir, sents, pad_to_batch_longest=True):
    """Independent torch transliteration of reference SBERT_ENCODER.forward
    (encoder.py:41-70): sort by length desc, tokenize (SentenceTransformer
    pads to the batch longest), forward, zero padded tokens, unsort, mean-pool
    by the attention-mask sum, mask = attn == 0."""
    tokenizer = transformers.AutoTokenizer.from_pretrained(model_dir)
    model = transformers.RobertaModel.from_pretrained(model_dir)
    model.eval()

    sent_lens = torch.tensor([len(s.split()) for s in sents])
    sorted_lens, sorted_idx = sent_lens.sort(descending=True)
    sorted_sents = [sents[i] for i in sorted_idx]

    toks = tokenizer(
        sorted_sents,
        padding="longest" if pad_to_batch_longest else "max_length",
        truncation=True, max_length=MAX_LEN, return_tensors="pt",
    )
    with torch.no_grad():
        embeddings = model(**toks).last_hidden_state
    attn_mask = toks["attention_mask"]
    embeddings = embeddings * attn_mask.unsqueeze(-1).float()

    inv = sorted_idx.argsort()
    words_embs = embeddings[inv]
    attn_mask = attn_mask[inv]
    sum_mask = attn_mask.unsqueeze(-1).sum(1)
    mask = attn_mask == 0
    sent_embs = words_embs.sum(1) / sum_mask
    return (
        words_embs.numpy(), sent_embs.numpy(), mask.numpy(), attn_mask.numpy()
    )


def test_hf_encode_matches_torch_forward(tiny_roberta_dir, cfg):
    """make_hf_sbert_encode (Flax, from_pt conversion) == torch RobertaModel."""
    encode = make_hf_sbert_encode(cfg, model_path=tiny_roberta_dir)
    embs, attn = encode(SENTS)
    assert embs.shape == (len(SENTS), MAX_LEN, HIDDEN)
    assert attn.shape == (len(SENTS), MAX_LEN)

    tokenizer = transformers.AutoTokenizer.from_pretrained(tiny_roberta_dir)
    model = transformers.RobertaModel.from_pretrained(tiny_roberta_dir)
    model.eval()
    toks = tokenizer(
        SENTS, padding="max_length", truncation=True, max_length=MAX_LEN,
        return_tensors="pt",
    )
    with torch.no_grad():
        want = model(**toks).last_hidden_state.numpy()
    np.testing.assert_array_equal(attn, toks["attention_mask"].numpy())
    # only real-token positions are meaningful (the pipeline zeroes padding)
    m = attn[..., None].astype(bool)
    np.testing.assert_allclose(
        np.where(m, embs, 0), np.where(m, want, 0), rtol=1e-4, atol=1e-5
    )


def test_pipeline_matches_reference_encoder_semantics(
    tiny_roberta_dir, cfg, tmp_path
):
    """Full production path — build_sbert_cache -> SbertCache ->
    make_encode_fn pooling — against the reference SBERT_ENCODER.forward
    transliteration (sort/unsort, batch-longest padding, masked mean pool)."""
    from xmc_gan_tpu.trainer import make_encode_fn

    data_dir = str(tmp_path)
    with open(os.path.join(data_dir, "bert_captions.pickle"), "wb") as f:
        pickle.dump([SENTS, SENTS[:3]], f)
    build_sbert_cache(data_dir, cfg, model_path=tiny_roberta_dir, batch_size=2)

    encode_fn = make_encode_fn(cfg, synthetic=False, data_dir=data_dir)
    idx = np.arange(len(SENTS))
    words, sent, mask = encode_fn({"cap_idx": idx, "mode": ["train"]})

    ref_words, ref_sent, ref_mask, ref_attn = _torch_reference_forward(
        tiny_roberta_dir, SENTS
    )
    t_ref = ref_words.shape[1]  # reference pads to the batch longest only
    # fp16 cache -> modest tolerances
    np.testing.assert_allclose(
        np.asarray(sent), ref_sent, rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(words)[:, :t_ref], ref_words, rtol=2e-3, atol=2e-3
    )
    assert not np.asarray(words)[:, t_ref:].any()  # padding zeroed
    np.testing.assert_array_equal(np.asarray(mask)[:, :t_ref], ref_mask)
    assert np.asarray(mask)[:, t_ref:].all()

    # test split reads the other cache file
    words3, sent3, _ = encode_fn({"cap_idx": np.arange(3), "mode": ["test"]})
    np.testing.assert_allclose(
        np.asarray(sent3), np.asarray(sent)[:3], rtol=1e-5, atol=1e-6
    )


def test_bert_norm_matches_reference(tiny_roberta_dir, tmp_path):
    """TEXT.BERT_NORM=True applies the reference's F.normalize(p=2, dim=1)
    (encoder.py:65-66)."""
    from xmc_gan_tpu.trainer import make_encode_fn

    cfg_n = cfg_from_dict({
        "TEXT": {
            "ENCODER_NAME": "SBERT", "TYPE": "SENT",
            "EMBEDDING_DIM": HIDDEN, "MAX_LENGTH": MAX_LEN,
            "POOLING_MODE": "MEAN", "BERT_NORM": True,
        },
    })
    data_dir = str(tmp_path)
    with open(os.path.join(data_dir, "bert_captions.pickle"), "wb") as f:
        pickle.dump([SENTS, SENTS[:2]], f)
    build_sbert_cache(data_dir, cfg_n, model_path=tiny_roberta_dir)

    encode_fn = make_encode_fn(cfg_n, synthetic=False, data_dir=data_dir)
    _, sent, _ = encode_fn({"cap_idx": np.arange(len(SENTS)), "mode": ["train"]})

    _, ref_sent, _, _ = _torch_reference_forward(tiny_roberta_dir, SENTS)
    ref_sent = ref_sent / np.maximum(
        np.linalg.norm(ref_sent, axis=1, keepdims=True), 1e-12
    )
    np.testing.assert_allclose(np.asarray(sent), ref_sent, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(sent), axis=1), 1.0, rtol=1e-4
    )
