"""Integration tests: a few optimization steps on synthetic data.

Covers SURVEY.md §4 integration items: finite losses, both D updates under
MAGP, the N_CRITIC counter semantics, spectral-state refresh, and that G's
``proj_sent`` receives gradients through D's conditioning (the reference quirk
of ``train_gan.py:191``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xmc_gan_tpu.config import cfg_from_dict
from xmc_gan_tpu.train import create_train_state, jit_train_step, make_train_step


def tiny_cfg(**overrides):
    base = {
        "TRAIN": {
            "NCH": 8, "NEF": 32, "NOISE_DIM": 16, "HE_INIT": True,
            "RMIS_LOSS": True, "MAGP": True, "N_CRITIC": 1,
            "ENCODER_LOSS": {"SENT": True, "DISC": True, "B_GLOBAL": False},
            "SMOOTH": {"GLOBAL": 0.0},
        },
        "IMG": {"SIZE": 64},
        "TEXT": {"EMBEDDING_DIM": 48, "MAX_LENGTH": 8},
        "DISC": {"SPEC_NORM": False, "IMG_MATCH": True},
    }
    def merge(a, b):
        for k, v in b.items():
            a[k] = merge(a.get(k, {}), v) if isinstance(v, dict) else v
        return a
    return cfg_from_dict(merge(base, overrides))


def synthetic_batch(cfg, bs=4, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "imgs": jnp.asarray(
            rng.uniform(-1, 1, (bs, cfg.IMG.SIZE, cfg.IMG.SIZE, 3)), jnp.float32
        ),
        "sent_embs": jnp.asarray(rng.randn(bs, cfg.TEXT.EMBEDDING_DIM), jnp.float32),
        "words_embs": jnp.asarray(
            rng.randn(bs, cfg.TEXT.MAX_LENGTH, cfg.TEXT.EMBEDDING_DIM), jnp.float32
        ),
        "mask": jnp.asarray(rng.rand(bs, cfg.TEXT.MAX_LENGTH) > 0.7),
    }


def leaf_l2_delta(a, b):
    return sum(
        float(jnp.sum(jnp.square(x - y)))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


@pytest.mark.slow
def test_two_steps_finite_and_params_move():
    cfg = tiny_cfg()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn = jit_train_step(cfg)
    batch = synthetic_batch(cfg)
    s1, m1 = step_fn(state, batch, jax.random.PRNGKey(1))
    s2, m2 = step_fn(s1, synthetic_batch(cfg, seed=1), jax.random.PRNGKey(2))
    for name, val in m2.items():
        assert bool(jnp.isfinite(val)), f"{name} not finite: {val}"
    assert int(s2.step) == 2
    assert float(m1["d_loss_gp"]) >= 0.0


@pytest.mark.slow
def test_g_and_d_params_change_after_step():
    cfg = tiny_cfg()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg)
    new_state, _ = step_fn(state, synthetic_batch(cfg), jax.random.PRNGKey(1))
    assert leaf_l2_delta(state.g_params, new_state.g_params) > 0
    assert leaf_l2_delta(state.d_params, new_state.d_params) > 0


def test_sent_loss_without_projection_head_rejected():
    """Reference-parity config validation (`assert cfg.DISC.SENT_MATCH or
    cfg.DISC.IMG_MATCH`, train_gan.py:217): ENCODER_LOSS.SENT with neither
    projection head must fail at step construction — even when the pooled
    trunk dim happens to equal NEF, where the shapes alone would let the
    sentence InfoNCE silently compare unaligned feature spaces."""
    cfg = tiny_cfg(DISC={"IMG_MATCH": False, "SENT_MATCH": False})
    with pytest.raises(ValueError, match="SENT_MATCH or DISC.IMG_MATCH"):
        make_train_step(cfg)


def test_magp_is_second_d_update():
    """With MAGP the D params after the step differ from a MAGP-off run with
    identical RNG — and the penalty metric is produced."""
    cfg_on = tiny_cfg()
    cfg_off = tiny_cfg(TRAIN={"MAGP": False})
    state = create_train_state(cfg_on, jax.random.PRNGKey(0))
    batch = synthetic_batch(cfg_on)
    # jit (no donation: `state` feeds both programs) — the grad-of-grad MAGP
    # step is minutes of eager op-by-op dispatch, seconds compiled+cached
    s_on, m_on = jax.jit(make_train_step(cfg_on))(state, batch, jax.random.PRNGKey(1))
    s_off, m_off = jax.jit(make_train_step(cfg_off))(state, batch, jax.random.PRNGKey(1))
    assert float(m_on["d_loss_gp"]) > 0.0
    assert float(m_off["d_loss_gp"]) == 0.0
    assert leaf_l2_delta(s_on.d_params, s_off.d_params) > 0
    # G step sees the twice-updated D, so G also diverges
    assert leaf_l2_delta(s_on.g_params, s_off.g_params) > 0


@pytest.mark.slow
def test_n_critic_two_updates_g_every_second_step():
    cfg = tiny_cfg(TRAIN={"N_CRITIC": 2, "MAGP": False})
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg)
    s1, m1 = step_fn(state, synthetic_batch(cfg), jax.random.PRNGKey(1))
    assert not bool(m1["g_updated"])  # step counter 0 -> (0+1)%2 != 0
    assert leaf_l2_delta(state.g_params, s1.g_params) == 0
    assert leaf_l2_delta(state.d_params, s1.d_params) > 0  # D still trains
    s2, m2 = step_fn(s1, synthetic_batch(cfg, seed=1), jax.random.PRNGKey(2))
    assert bool(m2["g_updated"])
    assert leaf_l2_delta(s1.g_params, s2.g_params) > 0


def test_proj_sent_gets_gradients_through_d_conditioning():
    """netG.proj_sent is updated by the G step even though it only feeds D
    (reference train_gan.py:191,260)."""
    cfg = tiny_cfg(TRAIN={"MAGP": False, "ENCODER_LOSS": {"SENT": False, "DISC": False}})
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    new_state, _ = make_train_step(cfg)(state, synthetic_batch(cfg), jax.random.PRNGKey(1))
    # EMBEDDING_DIM(48) != NEF(32) so proj_sent_dense exists
    old = state.g_params["proj_sent_dense"]["kernel"]
    new = new_state.g_params["proj_sent_dense"]["kernel"]
    assert float(jnp.sum(jnp.square(old - new))) > 0


@pytest.mark.slow
def test_spectral_state_refreshes():
    cfg = tiny_cfg(DISC={"SPEC_NORM": True}, TRAIN={"MAGP": False})
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    new_state, m = make_train_step(cfg)(state, synthetic_batch(cfg), jax.random.PRNGKey(1))
    d_old = jax.tree.leaves(state.d_spectral)
    d_new = jax.tree.leaves(new_state.d_spectral)
    assert len(d_old) > 0
    assert any(float(jnp.sum(jnp.square(a - b))) > 0 for a, b in zip(d_old, d_new))
    for name, val in m.items():
        assert bool(jnp.all(jnp.isfinite(val))), name


def test_refresh_spectral_iters_converges_to_top_singular_value():
    """``refresh_spectral(iters=N)``: N power-iteration steps per call.
    iters=1 is one step (the default cadence); a large N drives u^T W v to
    the exact top singular value — the property behind the 1-vs-5 cadence
    A/B (reference refreshes once per D forward, modules.py:13-33; BASELINE
    'Spectral-norm refresh cadence')."""
    import numpy as np

    from xmc_gan_tpu.train import refresh_spectral

    rng = np.random.RandomState(3)
    kernel = jnp.asarray(rng.randn(24, 16), jnp.float32)  # dense [in, out]
    params = {"lin": {"kernel": kernel}}
    u0 = rng.randn(16).astype(np.float32)
    u0 /= np.linalg.norm(u0)
    spec = {"lin": {"u": jnp.asarray(u0), "v": jnp.zeros((24,), jnp.float32)}}

    sig_true = float(np.linalg.svd(np.asarray(kernel).T, compute_uv=False)[0])

    def sigma(s):
        w = np.asarray(kernel).T  # [out, in], the power-iteration layout
        return float(np.asarray(s["lin"]["u"]) @ (w @ np.asarray(s["lin"]["v"])))

    s1 = refresh_spectral(params, spec, iters=1)
    s50 = refresh_spectral(params, spec, iters=50)
    # 50 fused steps == 50 sequential single steps (pure function of (u, W))
    s_seq = spec
    for _ in range(50):
        s_seq = refresh_spectral(params, s_seq, iters=1)
    assert np.allclose(np.asarray(s50["lin"]["u"]),
                       np.asarray(s_seq["lin"]["u"]), atol=1e-5)
    # convergence: 50 steps is strictly better than 1, and near-exact
    assert abs(sigma(s50) - sig_true) <= abs(sigma(s1) - sig_true) + 1e-6
    assert abs(sigma(s50) - sig_true) < 1e-3 * sig_true


def test_seperate_mode_conditions_on_raw_sentence():
    cfg = tiny_cfg(DISC={"SEPERATE": True, "IMG_MATCH": False},
                   TRAIN={"ENCODER_LOSS": {"SENT": False, "DISC": False}, "MAGP": False})
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    new_state, m = make_train_step(cfg)(state, synthetic_batch(cfg), jax.random.PRNGKey(1))
    assert bool(jnp.isfinite(m["Loss_D"]))

