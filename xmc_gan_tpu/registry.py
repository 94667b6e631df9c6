"""String -> factory registries for datasets, text encoders, generators and
discriminators, mirroring the reference registries (``train_gan.py:40-49``)
over Flax factories.  Imports are lazy so partially-present model families do
not break unrelated configs.
"""

from __future__ import annotations

from typing import Callable

__all__ = ["get_generator", "get_discriminator", "get_text_encoder", "get_dataset"]


def _gen_arch() -> dict[str, Callable]:
    from xmc_gan_tpu.models import df_gan

    table = {"DF_GEN": df_gan.NetG}
    try:
        from xmc_gan_tpu.models import df_concept_gan

        table["CONCEPT_IN_DF_GEN"] = df_concept_gan.InNetG
        table["CONCEPT_OUT_DF_GEN"] = df_concept_gan.OutNetG
    except ImportError:
        pass
    try:
        from xmc_gan_tpu.models import concept_gan

        table["CONCEPT_INATTN_GEN"] = concept_gan.InNetG
        table["CONCEPT_OUTATTN_GEN"] = concept_gan.OutNetG
    except ImportError:
        pass
    return table


def _disc_arch() -> dict[str, Callable]:
    from xmc_gan_tpu.models import df_gan

    table = {"DF_DISC": df_gan.NetD}
    try:
        from xmc_gan_tpu.models import df_concept_gan

        table["CONCEPT_NETD"] = df_concept_gan.NetD
    except ImportError:
        pass
    return table


def get_generator(name: str):
    table = _gen_arch()
    if name not in table:
        raise KeyError(f"Unknown generator {name!r}; available: {sorted(table)}")
    return table[name]


def get_discriminator(name: str):
    table = _disc_arch()
    if name not in table:
        raise KeyError(f"Unknown discriminator {name!r}; available: {sorted(table)}")
    return table[name]


def get_text_encoder(name: str):
    from xmc_gan_tpu.models import encoder

    table = {"RNN": encoder.RNNEncoder, "SBERT": encoder.SBERTEncoder}
    if name not in table:
        raise KeyError(f"Unknown text encoder {name!r}; available: {sorted(table)}")
    return table[name]


def get_dataset(name: str):
    from xmc_gan_tpu.data import pipeline

    table = {"WORD": pipeline.WordTextDataset, "SENT": pipeline.SentTextDataset}
    if name not in table:
        raise KeyError(f"Unknown dataset type {name!r}; available: {sorted(table)}")
    return table[name]
