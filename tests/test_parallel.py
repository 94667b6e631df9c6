"""Distributed invariants on the simulated 8-device CPU mesh (SURVEY.md §4):

* global-batch contrastive loss on N devices == single-device loss on the
  concatenated batch (both the GSPMD path and the explicit shard_map path);
* one full train step under a dp=4 x tp=2 mesh produces (numerically) the
  same new state as the unsharded step.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from xmc_gan_tpu import losses
from xmc_gan_tpu.config import cfg_from_dict
from xmc_gan_tpu.parallel import make_mesh, shard_batch, state_shardings, batch_shardings
from xmc_gan_tpu.parallel.collectives import make_sharded_sent_loss
from xmc_gan_tpu.train import create_train_state, make_train_step


def test_shard_map_contrastive_equals_single_device(eight_devices):
    mesh = make_mesh(dp=8, tp=1)
    rng = np.random.RandomState(0)
    B, D = 32, 24
    img = jnp.asarray(rng.randn(B, D), jnp.float32)
    txt = jnp.asarray(rng.randn(B, D), jnp.float32)
    sent = jnp.asarray(rng.randn(B, 16), jnp.float32)

    # single-device reference over the full batch
    labels = losses.make_labels(sent, True, 0.0)
    want = losses.sent_loss(img, txt, labels, True, 0.0)

    sharded_fn = make_sharded_sent_loss(mesh, b_global=True, smooth_global=0.0)
    spec = NamedSharding(mesh, P("data", None))
    got = sharded_fn(
        jax.device_put(img, spec), jax.device_put(txt, spec), jax.device_put(sent, spec)
    )
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_shard_map_contrastive_gradient_equals_single_device(eight_devices):
    """pmean of per-replica grads == grad of the global loss (the invariant
    that justifies plain DP gradient averaging with gathered negatives)."""
    mesh = make_mesh(dp=8, tp=1)
    rng = np.random.RandomState(1)
    B, D = 16, 8
    img = jnp.asarray(rng.randn(B, D), jnp.float32)
    txt = jnp.asarray(rng.randn(B, D), jnp.float32)
    sent = jnp.asarray(rng.randn(B, 8), jnp.float32)

    def single(img):
        labels = losses.make_labels(sent, False, 0.5)
        return losses.sent_loss(img, txt, labels, False, 0.5)

    want = jax.grad(single)(img)

    from xmc_gan_tpu.parallel.collectives import shard_map, global_sent_loss

    def per_replica(img_l, txt_l, sent_l):
        g = jax.grad(
            lambda im: global_sent_loss(im, txt_l, sent_l, False, 0.5)
        )(img_l)
        # Each replica evaluates an identical copy of the global loss, so the
        # all_gather transpose (psum_scatter) sums N identical cotangents into
        # the local shard; the pmean of per-replica grads (here: /N, since each
        # shard lives on exactly one replica) recovers the global-loss grad.
        return g / jax.lax.psum(1, "data")

    f = shard_map(
        per_replica, mesh=mesh,
        in_specs=(P("data", None),) * 3, out_specs=P("data", None),
        check_rep=False,
    )
    spec = NamedSharding(mesh, P("data", None))
    got = f(jax.device_put(img, spec), jax.device_put(txt, spec),
            jax.device_put(sent, spec))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-6)


def _word_inputs(b=16, r=8, t=6, d=8, seed=3):
    rng = np.random.RandomState(seed)
    regions = jnp.asarray(rng.randn(b, r, d), jnp.float32)
    words = jnp.asarray(rng.randn(b, t, d), jnp.float32)
    mask = jnp.asarray(rng.rand(b, t) > 0.7)
    # no all-padded caption (its score is a masked-logsumexp edge case already
    # covered by the word-loss unit tests)
    mask = mask.at[:, 0].set(False)
    return regions, words, mask


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2)])
def test_sharded_word_scores_match_single_device(eight_devices, dp, tp):
    """Row-block shard_map word scores == single-device global scores, for
    values AND gradients, on dp-only and dp x tp meshes.  block_elems is
    forced tiny so the streaming (lax.map) path — the one the LN config uses
    on TPU when Pallas is off — runs under shard_map."""
    from xmc_gan_tpu.parallel.collectives import make_sharded_word_scores

    mesh = make_mesh(dp=dp, tp=tp)
    regions, words, mask = _word_inputs()
    cot = jnp.asarray(np.random.RandomState(7).randn(16, 16), jnp.float32)

    def single(r, w):
        s = losses.word_region_scores(r, w, mask, 4.0, 5.0, block_elems=64)
        return jnp.sum(s * cot), s

    (want_val, want_s), (want_dr, want_dw) = jax.value_and_grad(
        single, argnums=(0, 1), has_aux=True
    )(regions, words)

    sharded = make_sharded_word_scores(mesh, 4.0, 5.0, block_elems=64)

    def dist(r, w):
        s = sharded(r, w, mask)
        return jnp.sum(s * cot), s

    spec3 = NamedSharding(mesh, P("data", None, None))
    r_s = jax.device_put(regions, spec3)
    w_s = jax.device_put(words, spec3)
    (got_val, got_s), (got_dr, got_dw) = jax.jit(
        jax.value_and_grad(dist, argnums=(0, 1), has_aux=True)
    )(r_s, w_s)

    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(got_val), float(want_val), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_dr), np.asarray(want_dr), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_dw), np.asarray(want_dw), rtol=1e-4, atol=1e-6)


def test_sharded_word_scores_tp_fallback_when_indivisible(eight_devices):
    """When B_global does not divide by tp, the caption-axis split is skipped
    and every model rank computes full columns — values and grads must still
    match single-device (dp=2 x tp=4, B=6: 6 % 4 != 0)."""
    from xmc_gan_tpu.parallel.collectives import make_sharded_word_scores

    mesh = make_mesh(dp=2, tp=4)
    regions, words, mask = _word_inputs(b=6, r=4, t=5, d=8)
    cot = jnp.asarray(np.random.RandomState(11).randn(6, 6), jnp.float32)

    def single(r, w):
        s = losses.word_region_scores(r, w, mask, 4.0, 5.0, block_elems=32)
        return jnp.sum(s * cot)

    want_val = single(regions, words)
    want_dr, want_dw = jax.grad(single, argnums=(0, 1))(regions, words)

    sharded = make_sharded_word_scores(mesh, 4.0, 5.0, block_elems=32)

    def dist(r, w):
        return jnp.sum(sharded(r, w, mask) * cot)

    spec3 = NamedSharding(mesh, P("data", None, None))
    r_s, w_s = jax.device_put(regions, spec3), jax.device_put(words, spec3)
    got_val = jax.jit(dist)(r_s, w_s)
    got_dr, got_dw = jax.jit(jax.grad(dist, argnums=(0, 1)))(r_s, w_s)
    np.testing.assert_allclose(float(got_val), float(want_val), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_dr), np.asarray(want_dr), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_dw), np.asarray(want_dw), rtol=1e-4, atol=1e-6)


def test_sharded_word_scores_pallas_interpret(eight_devices):
    """The fused Pallas kernel lowers and matches numerics *inside* shard_map
    (interpret mode on the CPU mesh; on a real TPU mesh the same per-device
    pallas_call runs compiled — the GSPMD-opacity problem the row-block
    formulation exists to avoid)."""
    from xmc_gan_tpu.parallel.collectives import make_sharded_word_scores

    mesh = make_mesh(dp=4, tp=1)
    regions, words, mask = _word_inputs(b=8, r=4, t=4, d=4)
    want = losses.word_region_scores(regions, words, mask, 4.0, 5.0)

    sharded = make_sharded_word_scores(
        mesh, 4.0, 5.0, backend="pallas", interpret=True
    )
    spec3 = NamedSharding(mesh, P("data", None, None))
    got = jax.jit(sharded)(
        jax.device_put(regions, spec3), jax.device_put(words, spec3),
        jax.device_put(mask, NamedSharding(mesh, P("data", None))),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_sharded_word_scores_per_device_flops(eight_devices):
    """Each device runs ~1/dp of the pairwise score FLOPs (the point of the
    row-block formulation: LN-scale deployment must not replicate the loss).
    Measured on the unblocked einsum formulation — XLA cost analysis counts a
    while-loop body once regardless of trip count, so the streaming path's
    FLOPs are not comparable across block geometries."""
    from xmc_gan_tpu.parallel.collectives import make_sharded_word_scores

    mesh = make_mesh(dp=8, tp=1)
    regions, words, mask = _word_inputs(b=32, r=16, t=8, d=16)

    def flops_of(fn, *args):
        comp = jax.jit(fn).lower(*args).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])

    single_flops = flops_of(
        lambda r, w, m: losses.word_region_scores(r, w, m, 4.0, 5.0, block_elems=None),
        regions, words, mask,
    )

    sharded = make_sharded_word_scores(mesh, 4.0, 5.0, block_elems=None)
    spec3 = NamedSharding(mesh, P("data", None, None))
    sharded_flops = flops_of(
        sharded,
        jax.device_put(regions, spec3), jax.device_put(words, spec3),
        jax.device_put(mask, NamedSharding(mesh, P("data", None))),
    )
    # per-device cost ~1/8 of global (some slack for the gather + reductions)
    assert sharded_flops < single_flops * 0.25, (
        f"sharded per-device flops {sharded_flops:.3g} vs single-device "
        f"{single_flops:.3g} — word scores look replicated, not partitioned"
    )


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = cfg_from_dict({
        "TRAIN": {
            "NCH": 8, "NEF": 32, "NOISE_DIM": 16, "HE_INIT": True,
            "RMIS_LOSS": True, "MAGP": True, "N_CRITIC": 1,
            "ENCODER_LOSS": {"SENT": True, "DISC": True, "B_GLOBAL": True},
            "SMOOTH": {"GLOBAL": 0.0},
        },
        "IMG": {"SIZE": 64},
        "TEXT": {"EMBEDDING_DIM": 48, "MAX_LENGTH": 8},
        "DISC": {"SPEC_NORM": True, "IMG_MATCH": True},
    })
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    bs = 8
    batch = {
        "imgs": jnp.asarray(rng.uniform(-1, 1, (bs, 64, 64, 3)), jnp.float32),
        "sent_embs": jnp.asarray(rng.randn(bs, 48), jnp.float32),
        "words_embs": jnp.asarray(rng.randn(bs, 8, 48), jnp.float32),
        "mask": jnp.asarray(rng.rand(bs, 8) > 0.7),
    }
    return cfg, state, batch


@pytest.mark.slow
def test_train_step_dp_tp_mesh_matches_single_device(tiny_setup, eight_devices):
    cfg, state, batch = tiny_setup
    step = make_train_step(cfg)
    want_state, want_metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(1))

    mesh = make_mesh(dp=4, tp=2)
    st_shard = state_shardings(mesh, state, tp_min_size=1 << 12)
    b_shard = batch_shardings(mesh, batch)
    sharded_step = jax.jit(
        step, in_shardings=(st_shard, b_shard, None), out_shardings=None
    )
    got_state, got_metrics = sharded_step(
        jax.device_put(state, st_shard), shard_batch(mesh, batch), jax.random.PRNGKey(1)
    )
    for k in want_metrics:
        np.testing.assert_allclose(
            float(got_metrics[k]), float(want_metrics[k]), rtol=5e-3, atol=1e-5,
            err_msg=f"metric {k}",
        )
    # parameters agree leaf-wise
    for (pw, w), (pg, g) in zip(
        jax.tree_util.tree_leaves_with_path(want_state.g_params),
        jax.tree_util.tree_leaves_with_path(got_state.g_params),
    ):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=5e-3, atol=2e-5, err_msg=str(pw)
        )


@pytest.mark.slow
def test_train_step_word_loss_mesh_matches_single_device(eight_devices):
    """Full WORD-loss train step: the shard_map row-block path (mesh passed to
    make_train_step) reproduces the single-device step's metrics and params."""
    cfg = cfg_from_dict({
        "TRAIN": {
            "NCH": 8, "NEF": 32, "NOISE_DIM": 16, "HE_INIT": True,
            "RMIS_LOSS": True, "MAGP": True, "N_CRITIC": 1,
            "ENCODER_LOSS": {"SENT": True, "WORD": True, "DISC": True,
                             "B_GLOBAL": True},
            "SMOOTH": {"GLOBAL": 0.0, "WORD": 1.0},
        },
        "IMG": {"SIZE": 64},
        "TEXT": {"EMBEDDING_DIM": 48, "MAX_LENGTH": 8},
        "DISC": {"SPEC_NORM": True, "IMG_MATCH": True},
    })
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    bs = 8
    batch = {
        "imgs": jnp.asarray(rng.uniform(-1, 1, (bs, 64, 64, 3)), jnp.float32),
        "sent_embs": jnp.asarray(rng.randn(bs, 48), jnp.float32),
        "words_embs": jnp.asarray(rng.randn(bs, 8, 48), jnp.float32),
        "mask": jnp.asarray(rng.rand(bs, 8) > 0.7),
    }
    want_state, want_metrics = jax.jit(make_train_step(cfg))(
        state, batch, jax.random.PRNGKey(1)
    )

    mesh = make_mesh(dp=4, tp=2)
    st_shard = state_shardings(mesh, state, tp_min_size=1 << 12)
    b_shard = batch_shardings(mesh, batch)
    sharded_step = jax.jit(
        make_train_step(cfg, mesh=mesh),
        in_shardings=(st_shard, b_shard, None),
    )
    got_state, got_metrics = sharded_step(
        jax.device_put(state, st_shard), shard_batch(mesh, batch),
        jax.random.PRNGKey(1),
    )
    for k in want_metrics:
        np.testing.assert_allclose(
            float(got_metrics[k]), float(want_metrics[k]), rtol=5e-3, atol=1e-5,
            err_msg=f"metric {k}",
        )
    assert float(want_metrics["ds_word"]) != 0.0
    for (pw, w), (pg, g) in zip(
        jax.tree_util.tree_leaves_with_path(want_state.g_params),
        jax.tree_util.tree_leaves_with_path(got_state.g_params),
    ):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=5e-3, atol=2e-5, err_msg=str(pw)
        )


def test_state_shardings_shard_large_kernels_on_model_axis(tiny_setup, eight_devices):
    cfg, state, _ = tiny_setup
    mesh = make_mesh(dp=4, tp=2)
    shards = state_shardings(mesh, state, tp_min_size=1 << 12)
    leaves = jax.tree.leaves(shards)
    assert any("model" in str(s.spec) for s in leaves), "no TP-sharded leaf found"
    # scalars/step stay replicated
    assert str(shards.step.spec) == "PartitionSpec()"
