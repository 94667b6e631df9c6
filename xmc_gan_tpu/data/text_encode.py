"""Offline Sentence-BERT encoding: precompute-first text pipeline.

The reference tokenizes raw caption strings and runs the full 125M-parameter
``SentenceTransformer('stsb-roberta-base')`` *inside the training loop on the
training GPU* (``encoder.py:41-48``, invoked per step at ``train_gan.py:180``).
On TPU that is the wrong shape: the frozen transformer would occupy HBM and
serialize with the GAN step.  Here captions are encoded **once, offline**
into a token-embedding cache; the train loop reads cached ``[T, D]`` token
embeddings per caption and applies only the cheap pooling math
(``models/encoder.SBERTEncoder``) on device.

Artifacts (at the dataset root, next to ``bert_captions.pickle``):
    ``sbert_cache_train.npz`` / ``sbert_cache_test.npz``
        token_embs: float16 [N, MAX_LENGTH, 768]
        attn_mask:  uint8   [N, MAX_LENGTH]

``build_sbert_cache`` needs HuggingFace RoBERTa weights locally (gated import:
clear error offline).  ``SbertCache`` only needs numpy.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

SBERT_MODEL = "sentence-transformers/stsb-roberta-base"

__all__ = ["SbertCache", "build_sbert_cache", "make_hf_sbert_encode"]


def make_hf_sbert_encode(cfg, model_path: str | None = None):
    """HF Flax RoBERTa encode function: list[str] -> (token_embs, attn_mask).

    ``model_path`` overrides the default hub id with a local checkpoint
    directory (any RoBERTa-architecture save_pretrained dir works — parity is
    tested against a tiny deterministic checkpoint in
    ``tests/test_sbert_hf.py``).  Weights must be available locally; raises a
    clear error otherwise (this environment has no network egress)."""
    try:
        from transformers import AutoTokenizer, FlaxRobertaModel
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("transformers is required for SBERT encoding") from e
    name = model_path or SBERT_MODEL
    try:
        tokenizer = AutoTokenizer.from_pretrained(name)
        model = FlaxRobertaModel.from_pretrained(name, from_pt=True)
    except Exception as e:
        raise RuntimeError(
            f"Could not load {name!r} weights locally. Download them on "
            "a machine with network access (huggingface-cli download "
            f"{name}) or build the cache there and copy "
            "sbert_cache_*.npz next to bert_captions.pickle."
        ) from e

    import jax

    max_len = cfg.TEXT.MAX_LENGTH

    @jax.jit
    def forward(input_ids, attention_mask):
        out = model(input_ids=input_ids, attention_mask=attention_mask)
        return out.last_hidden_state

    def encode(sents: list[str]):
        toks = tokenizer(
            sents, padding="max_length", truncation=True, max_length=max_len,
            return_tensors="np",
        )
        embs = forward(toks["input_ids"], toks["attention_mask"])
        return np.asarray(embs), np.asarray(toks["attention_mask"])

    return encode


def build_sbert_cache(
    data_dir: str, cfg, modes=("train", "test"), batch_size: int = 256,
    model_path: str | None = None,
) -> None:
    """Encode every caption in ``bert_captions.pickle`` and write the per-mode
    ``.npz`` caches (reference data format, ``dataset.py:119-127``)."""
    encode = make_hf_sbert_encode(cfg, model_path=model_path)
    with open(os.path.join(data_dir, "bert_captions.pickle"), "rb") as f:
        train_sents, test_sents = pickle.load(f)[:2]
    per_mode = {"train": train_sents, "test": test_sents}
    for mode in modes:
        sents = per_mode[mode]
        embs_out, mask_out = [], []
        for i in range(0, len(sents), batch_size):
            e, m = encode(list(sents[i : i + batch_size]))
            embs_out.append(e.astype(np.float16))
            mask_out.append(m.astype(np.uint8))
        np.savez(
            os.path.join(data_dir, f"sbert_cache_{mode}.npz"),
            token_embs=np.concatenate(embs_out),
            attn_mask=np.concatenate(mask_out),
        )


class SbertCache:
    """Reader for a precomputed token-embedding cache; indexed by the caption
    index the datasets already compute (``idx * caps_per_image + 1``)."""

    def __init__(self, data_dir: str, mode: str):
        path = os.path.join(data_dir, f"sbert_cache_{mode}.npz")
        if not os.path.isfile(path):
            raise FileNotFoundError(
                f"{path} not found — run "
                "xmc_gan_tpu.data.text_encode.build_sbert_cache() once "
                "(needs HF RoBERTa weights) or copy a prebuilt cache."
            )
        data = np.load(path, mmap_mode="r")
        self.token_embs = data["token_embs"]
        self.attn_mask = data["attn_mask"]

    def __len__(self) -> int:
        return self.token_embs.shape[0]

    def __call__(self, cap_idxs) -> tuple[np.ndarray, np.ndarray]:
        idx = np.asarray(cap_idxs)
        return (
            np.asarray(self.token_embs[idx], np.float32),
            np.asarray(self.attn_mask[idx], np.int32),
        )
