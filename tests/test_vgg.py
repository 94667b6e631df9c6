"""VGG-19 perceptual-loss path (the reference's last NotImplementedError in
the loss suite, ``train_gan.py:279-281``): topology/conversion parity against
a from-scratch torch oracle (torchvision is absent here, so the oracle
reconstructs torchvision's ``vgg19.features`` layout), plus the full train
step with ``ENCODER_LOSS.VGG`` on."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from xmc_gan_tpu.models.vgg import VGG19Features, vgg19_params_from_torch


def _torch_vgg19_features():
    """torchvision ``vgg19().features`` reconstructed: Sequential indices
    0..36 with convs at 0,2,5,...,34 — state_dict keys match torchvision."""
    import torch

    from xmc_gan_tpu.models.vgg import VGG19_CFG

    mods = []
    for v in VGG19_CFG:
        if v == "M":
            mods.append(torch.nn.MaxPool2d(2, 2))
        else:
            in_ch = 3 if not mods else next(
                m.out_channels for m in reversed(mods)
                if isinstance(m, torch.nn.Conv2d)
            )
            mods.append(torch.nn.Conv2d(in_ch, v, 3, padding=1))
            mods.append(torch.nn.ReLU(inplace=False))

    class Oracle(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.features = torch.nn.Sequential(*mods)

    return Oracle()


@pytest.mark.slow
def test_vgg_features_match_torch_oracle():
    import torch

    torch.manual_seed(0)
    oracle = _torch_vgg19_features().eval()
    variables = jax.tree.map(
        jnp.asarray, vgg19_params_from_torch(oracle.state_dict())
    )

    rng = np.random.RandomState(0)
    imgs = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)

    got = VGG19Features().apply(variables, jnp.asarray(imgs))

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    x = torch.from_numpy(imgs).permute(0, 3, 1, 2)
    x = ((x + 1.0) / 2.0 - mean) / std
    with torch.no_grad():
        feats = oracle.features[:36](x)  # through relu5_4
    want = feats.mean(dim=(2, 3)).numpy()

    assert got.shape == want.shape == (2, 512)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_vgg_tap_selection_shapes():
    params = VGG19Features(tap="relu2_2").init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )
    out = VGG19Features(tap="relu2_2").apply(params, jnp.zeros((2, 32, 32, 3)))
    assert out.shape == (2, 128)
    with pytest.raises(KeyError, match="unknown VGG tap"):
        VGG19Features(tap="relu9_9").init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
        )


def test_convert_vgg_weights_npz_roundtrip(tmp_path):
    """``cli convert-vgg-weights`` emits a torch-free .npz whose tree loads
    back identical to the direct torch conversion (the trainer's
    VGG_WEIGHTS_PATH=.npz path)."""
    import torch

    from xmc_gan_tpu.cli import main
    from xmc_gan_tpu.eval import load_fid_weights_npz

    torch.manual_seed(1)
    oracle = _torch_vgg19_features()
    src = tmp_path / "vgg19.pth"
    torch.save(oracle.state_dict(), src)
    out = tmp_path / "vgg19.npz"
    assert main(["convert-vgg-weights", "--src", str(src), "--out", str(out)]) == 0

    want = vgg19_params_from_torch(oracle.state_dict())
    got = load_fid_weights_npz(str(out))
    flat_w = jax.tree_util.tree_leaves_with_path(want)
    flat_g = jax.tree_util.tree_leaves_with_path(got)
    assert len(flat_w) == len(flat_g) == 2 * 16  # 16 convs, kernel+bias
    for (pw, lw), (pg, lg) in zip(flat_w, flat_g):
        assert pw == pg
        np.testing.assert_array_equal(np.asarray(lw), np.asarray(lg))


@pytest.mark.slow
def test_train_step_with_vgg_loss():
    from xmc_gan_tpu.config import cfg_from_dict
    from xmc_gan_tpu.train import create_train_state, make_train_step

    cfg = cfg_from_dict({
        "TRAIN": {
            "NCH": 8, "NEF": 32, "NOISE_DIM": 16, "HE_INIT": True,
            "RMIS_LOSS": True, "MAGP": True, "N_CRITIC": 1,
            "ENCODER_LOSS": {"SENT": True, "DISC": True, "VGG": True,
                             "B_GLOBAL": True},
            "SMOOTH": {"GLOBAL": 0.0},
        },
        "IMG": {"SIZE": 64},
        "TEXT": {"EMBEDDING_DIM": 48, "MAX_LENGTH": 6},
        "DISC": {"SPEC_NORM": True, "IMG_MATCH": True},
    })
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg)
    rng = np.random.RandomState(0)
    bs = 4
    batch = {
        "imgs": jnp.asarray(rng.uniform(-1, 1, (bs, 64, 64, 3)), jnp.float32),
        "sent_embs": jnp.asarray(rng.randn(bs, 48), jnp.float32),
        "words_embs": jnp.asarray(rng.randn(bs, 6, 48), jnp.float32),
        "mask": jnp.asarray(rng.rand(bs, 6) > 0.7),
    }
    with pytest.raises(ValueError, match="ENCODER_LOSS.VGG"):
        step(state, batch, jax.random.PRNGKey(1))

    vgg_vars = VGG19Features().init(
        jax.random.PRNGKey(19), jnp.zeros((1, 64, 64, 3))
    )
    state2, metrics = jax.jit(step)(
        state, batch, jax.random.PRNGKey(1), vgg_vars
    )
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    assert float(metrics["vgg_loss"]) != 0.0
    # VGG is frozen: only G/D state moves; the vgg variables are untouched
    assert int(state2.step) == 1


@pytest.mark.slow
def test_trainer_with_vgg_loss(tmp_path, eight_devices):
    """Trainer wiring: frozen VGG vars threaded through the jitted step
    (incl. the mesh in_shardings path) without entering the train state."""
    from xmc_gan_tpu.config import cfg_from_dict
    from xmc_gan_tpu.parallel import make_mesh
    from xmc_gan_tpu.trainer import Trainer

    cfg = cfg_from_dict({
        "DATASET_NAME": "synthetic", "CONFIG_NAME": "VGG_SMOKE",
        "TRAIN": {
            "NCH": 8, "NEF": 32, "NOISE_DIM": 16, "HE_INIT": True,
            "RMIS_LOSS": True, "MAGP": True, "N_CRITIC": 1, "BATCH_SIZE": 8,
            "ENCODER_LOSS": {"SENT": True, "DISC": True, "VGG": True,
                             "B_GLOBAL": True},
            "SMOOTH": {"GLOBAL": 0.0},
        },
        "IMG": {"SIZE": 64},
        "TEXT": {"EMBEDDING_DIM": 48, "MAX_LENGTH": 6, "ENCODER_NAME": "SBERT",
                 "TYPE": "SENT"},
        "DISC": {"SPEC_NORM": True, "IMG_MATCH": True},
    })
    tr = Trainer(
        cfg, seed=5, output_root=str(tmp_path), log_type="none",
        synthetic=True, synthetic_len=16, num_threads=1,
        mesh=make_mesh(dp=4, tp=2), eval_fid=False,
    )
    metrics = tr.fit(max_epochs=1, max_steps=2)
    assert np.isfinite(metrics["vgg_loss"])
    assert metrics["vgg_loss"] != 0.0
