"""Config-system tests: all 11 reference YAMLs load with the exact values,
strict-merge semantics match the reference ``_merge_a_into_b``
(``config/gan.py:92-122``), and every cfg resolves its registries."""

import glob
import os

import pytest

from xmc_gan_tpu.config import Config, cfg_from_dict, cfg_from_file
from xmc_gan_tpu.registry import get_discriminator, get_generator, get_text_encoder

CFG_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "xmc_gan_tpu", "cfg")
ALL_CFGS = sorted(glob.glob(os.path.join(CFG_DIR, "*.yml")))


REFERENCE_CFGS = {
    "concept_in_df_gan.yml", "concept_in_df_gan_damsm_nomagp.yml",
    "concept_in_df_gan_sbert.yml", "concept_in_df_gan_sbert_n2_damsm.yml",
    "concept_out_df_gan.yml", "concept_out_df_gan_sbert_damsm_nomagp.yml",
    "df_gan_damsm.yml", "df_gan_damsm_nomagp.yml", "df_gan_sbert.yml",
    "df_gan_sbert_damsm_nomagp.yml", "df_gan_sbert_seperate.yml",
}


def test_reference_configs_present():
    """All 11 reference YAML schemas ship (SURVEY.md §2 row 15); extensions
    (LN-COCO / LN-OpenImages) are additive."""
    names = {os.path.basename(p) for p in ALL_CFGS}
    assert REFERENCE_CFGS <= names, REFERENCE_CFGS - names


@pytest.mark.parametrize("path", ALL_CFGS, ids=os.path.basename)
def test_config_loads_and_registry_resolves(path):
    cfg = cfg_from_file(path)
    assert cfg.CONFIG_NAME
    assert cfg.IMG.SIZE in (64, 128, 256)
    get_generator(cfg.GEN.ENCODER_NAME)
    get_discriminator(cfg.DISC.ENCODER_NAME)
    get_text_encoder(cfg.TEXT.ENCODER_NAME)


def test_df_gan_damsm_values():
    """Spot-check against the reference cfg values (cfg/df_gan_damsm.yml)."""
    cfg = cfg_from_file(os.path.join(CFG_DIR, "df_gan_damsm.yml"))
    assert cfg.CONFIG_NAME == "DF_GAN_DAMSM"
    assert cfg.DATASET_NAME == "coco"
    assert cfg.TRAIN.MAX_EPOCH == 121
    assert cfg.TRAIN.BATCH_SIZE == 88
    assert cfg.TRAIN.NCH == 32
    assert cfg.TRAIN.NEF == 256
    assert cfg.TRAIN.NOISE_DIM == 100
    assert cfg.TRAIN.RMIS_LOSS and cfg.TRAIN.MAGP
    assert cfg.TRAIN.ENCODER_LOSS.SENT and cfg.TRAIN.ENCODER_LOSS.DISC
    assert not cfg.TRAIN.ENCODER_LOSS.WORD
    assert cfg.TRAIN.OPT.G_LR == 1e-4 and cfg.TRAIN.OPT.D_LR == 4e-4
    assert cfg.TRAIN.OPT.G_BETA1 == 0.0 and cfg.TRAIN.OPT.G_BETA2 == 0.9
    assert cfg.GEN.ENCODER_NAME == "DF_GEN"
    assert cfg.DISC.ENCODER_NAME == "DF_DISC"
    assert cfg.TEXT.TYPE == "WORD" and cfg.TEXT.ENCODER_NAME == "RNN"
    assert cfg.TEXT.EMBEDDING_DIM == 256


def test_unknown_key_raises_keyerror():
    with pytest.raises(KeyError, match="not a valid config key"):
        cfg_from_dict({"TRAIN": {"NOT_A_KEY": 1}})
    with pytest.raises(KeyError):
        cfg_from_dict({"TYPO_SECTION": {}})


def test_type_mismatch_raises_valueerror():
    with pytest.raises(ValueError, match="Type mismatch"):
        cfg_from_dict({"TRAIN": {"BATCH_SIZE": "eight"}})
    with pytest.raises(ValueError, match="Type mismatch"):
        cfg_from_dict({"TRAIN": {"MAGP": 1}})  # bool field, int given
    # int where float expected is accepted (YAML writes weights as ints)
    cfg = cfg_from_dict({"TRAIN": {"SMOOTH": {"SENT": 2}}})
    assert cfg.TRAIN.SMOOTH.SENT == 2.0


def test_config_is_immutable_and_hashable():
    cfg = Config()
    with pytest.raises(Exception):
        cfg.IMG.SIZE = 128  # frozen dataclass
    hash(cfg)  # usable as a static jit argument
    assert cfg.replace(CONFIG_NAME="X").CONFIG_NAME == "X"
    assert cfg.CONFIG_NAME == ""


def test_dead_keys_accepted_for_schema_parity():
    """Reference dead keys load without error (SURVEY.md §2 row 15)."""
    cfg = cfg_from_dict({
        "TRAIN": {"FLAG": False, "SAVE_INTERVAL": 5},
        "DISC": {"UNCOND": False, "COND": False},
        "TEXT": {"NUM_LAYERS": 2, "FIX_BERT": False,
                 "SENT_FT": True, "WORD_FT": True, "JOINT_FT": True},
    })
    assert cfg.TRAIN.SAVE_INTERVAL == 5
