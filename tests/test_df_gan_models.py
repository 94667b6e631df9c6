"""Shape/dtype/init tests for the DF-GAN Flax modules against the reference
architecture tables (``df_gan.py:9-61``) at all three resolutions."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xmc_gan_tpu.config import cfg_from_dict
from xmc_gan_tpu.models import df_gan
from xmc_gan_tpu.models.common import disc_arch, gen_arch


def make_cfg(img_size=64, text_dim=256, nef=256, he_init=True, spec_norm=False,
             img_match=False, sent_match=False, seperate=False):
    return cfg_from_dict({
        "TRAIN": {"NCH": 32, "NEF": nef, "NOISE_DIM": 100, "HE_INIT": he_init},
        "IMG": {"SIZE": img_size},
        "TEXT": {"EMBEDDING_DIM": text_dim},
        "DISC": {"SPEC_NORM": spec_norm, "IMG_MATCH": img_match,
                 "SENT_MATCH": sent_match, "SEPERATE": seperate},
    })


@pytest.mark.parametrize("img_size", [64, 128, 256])
def test_netg_output_shape(img_size):
    cfg = make_cfg(img_size)
    model = df_gan.NetG(cfg)
    rng = jax.random.PRNGKey(0)
    noise = jnp.zeros((2, 100))
    sent = jnp.zeros((2, 256))
    if img_size == 64:  # real compute at the smallest size only (CPU test budget)
        variables = model.init(rng, noise, sent)
        out = model.apply(variables, noise, sent)
        assert bool(jnp.all(jnp.abs(out) <= 1.0))  # tanh range
    else:  # shape-only via abstract evaluation
        variables = jax.eval_shape(model.init, rng, noise, sent)
        out = jax.eval_shape(model.apply, variables, noise, sent)
    assert out.shape == (2, img_size, img_size, 3)


@pytest.mark.parametrize("img_size", [64, 128, 256])
def test_netd_feature_shape(img_size):
    cfg = make_cfg(img_size)
    import functools

    model = df_gan.NetD(cfg)
    x = jnp.zeros((2, img_size, img_size, 3))
    sent = jnp.zeros((2, 256))
    if img_size == 64:
        variables = model.init(jax.random.PRNGKey(0), x, sent, method="d_all")
        feats = model.apply(variables, x)
        match, img_feat, sent_proj = model.apply(variables, feats, sent, method="logits")
    else:
        variables = jax.eval_shape(
            functools.partial(model.init, method="d_all"), jax.random.PRNGKey(0), x, sent
        )
        feats = jax.eval_shape(model.apply, variables, x)
        match, img_feat, sent_proj = jax.eval_shape(
            functools.partial(model.apply, method="logits"), variables, feats, sent
        )
    assert feats.shape == (2, 4, 4, 16 * 32)  # [B,4,4,ndf*16]
    assert match.shape == (2,)
    assert img_feat.shape == (2, 16 * 32)
    assert sent_proj.shape == (2, 256)


def test_gblock_stage_shapes_match_arch_table():
    """Each up-block output must match the reference gen_arch table."""
    cfg = make_cfg(256)
    arch = gen_arch(256, 32)
    x = jax.ShapeDtypeStruct((1, 4, 4, arch["in_channels"][0]), jnp.float32)
    cond = jax.ShapeDtypeStruct((1, 256), jnp.float32)
    res = 4
    for i in range(arch["depth"]):
        blk = df_gan.GBlock(
            in_dim=arch["in_channels"][i], out_dim=arch["out_channels"][i],
            cond_dim=256, upsample=arch["upsample"][i], he_init=True,
        )
        variables = jax.eval_shape(blk.init, jax.random.PRNGKey(i), x, cond)
        x = jax.eval_shape(blk.apply, variables, x, cond)
        if arch["upsample"][i]:
            res *= 2
        assert x.shape == (1, res, res, arch["out_channels"][i])
    assert res == arch["resolution"][-1]


def test_resd_stage_shapes_match_arch_table():
    cfg = make_cfg(128)
    arch = disc_arch(128, 32)
    x = jax.ShapeDtypeStruct((1, 128, 128, arch["out_channels"][0]), jnp.float32)
    for i in range(1, arch["depth"]):
        blk = df_gan.ResD(
            in_dim=arch["in_channels"][i], out_dim=arch["out_channels"][i],
            downsample=True, spec_norm=False, he_init=True,
        )
        variables = jax.eval_shape(blk.init, jax.random.PRNGKey(i), x)
        x = jax.eval_shape(blk.apply, variables, x)
        assert x.shape[-1] == arch["out_channels"][i]
        assert x.shape[1] == arch["resolution"][i - 1]


def test_zero_gate_makes_blocks_identity_at_init():
    """gamma gates init to zero -> a non-upsampling block is its shortcut
    (reference df_gan.py:195 zero-init gate)."""
    blk = df_gan.GBlock(in_dim=64, out_dim=64, cond_dim=32, upsample=False, he_init=True)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 64), jnp.float32)
    cond = jnp.ones((2, 32))
    variables = blk.init(jax.random.PRNGKey(0), x, cond)
    np.testing.assert_allclose(np.asarray(blk.apply(variables, x, cond)), np.asarray(x))


def test_affine_special_init_without_he():
    """Without HE_INIT the affine output MLP inits to gamma=1, beta=0 ->
    modulation is identity (reference df_gan.py:244-248)."""
    aff = df_gan.Affine(num_features=16, cond_dim=8, he_init=False)
    cond = jnp.asarray(np.random.RandomState(1).randn(3, 8), jnp.float32)
    variables = aff.init(jax.random.PRNGKey(0), cond)
    gamma, beta = aff.apply(variables, cond)
    np.testing.assert_allclose(np.asarray(gamma), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(beta), 0.0, atol=1e-6)


def test_affine_he_init_overrides_special_init():
    """With HE_INIT (all canonical configs) the gamma bias is 0, not 1 —
    the reference applies weight_init after construction (train_gan.py:476-478)."""
    aff = df_gan.Affine(num_features=16, cond_dim=8, he_init=True)
    variables = aff.init(jax.random.PRNGKey(0), jnp.zeros((1, 8)))
    gamma, beta = aff.apply(variables, jnp.zeros((1, 8)))
    np.testing.assert_allclose(np.asarray(gamma), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(beta), 0.0, atol=1e-6)


@pytest.mark.parametrize(
    "kwargs,expected_sent_dim",
    [
        (dict(img_match=True), 256),                       # img projected to nef
        (dict(sent_match=True), 16 * 32),                  # sent projected to ndf*16
        (dict(seperate=True, text_dim=768), 256),          # separate: text->nef
        (dict(), 256),                                     # identity
    ],
)
def test_dget_logits_modes(kwargs, expected_sent_dim):
    text_dim = kwargs.pop("text_dim", 256)
    cfg = make_cfg(64, text_dim=text_dim, **kwargs)
    head = df_gan.DGetLogits(cfg)
    x = jnp.zeros((2, 4, 4, 16 * 32))
    # In SEPERATE mode the head receives the raw text embedding, otherwise
    # G's nef-dim projection (reference train_gan.py:188-191).
    sent_in = jnp.zeros((2, text_dim if cfg.DISC.SEPERATE else 256))
    variables = head.init(jax.random.PRNGKey(0), x, sent_in)
    match, img_feat, sent_proj = head.apply(variables, x, sent_in)
    assert match.shape == (2,)
    assert sent_proj.shape == (2, expected_sent_dim)
    expected_img = 256 if cfg.DISC.IMG_MATCH else 16 * 32
    assert img_feat.shape == (2, expected_img)


def test_spectral_norm_constrains_sigma():
    """After repeated power iterations the effective spectral norm of an
    SN layer's weight is ~1."""
    from xmc_gan_tpu.ops.modules import SNDense

    layer = SNDense(32, spec_norm=True)
    x = jnp.ones((4, 48))
    variables = layer.init(jax.random.PRNGKey(0), x)
    params, spectral = variables["params"], variables["spectral"]
    for _ in range(50):
        _, updated = layer.apply(
            {"params": params, "spectral": spectral}, x, mutable=["spectral"]
        )
        spectral = updated["spectral"]
    w = np.asarray(params["kernel"])
    u = np.asarray(spectral["u"])
    v = np.asarray(spectral["v"])
    sigma = u @ (w.T @ v)  # kernel is (in, out); matricization is (out, in)
    true_sigma = np.linalg.svd(w, compute_uv=False).max()
    np.testing.assert_allclose(sigma, true_sigma, rtol=1e-4)


def test_netd_spec_norm_variables_exist():
    cfg = make_cfg(64, spec_norm=True)
    model = df_gan.NetD(cfg)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, jnp.zeros((2, 256)), method="d_all")
    assert "spectral" in variables
    # eval apply without mutable works (uses stored u/v)
    model.apply(variables, x)


def test_fused_upsample_forward_matches_unfused():
    """fuse_upsample is an exact algebraic restructure: deferring each block's
    trailing nearest-2x upsample into the next block's first conv (stride-2
    transposed conv with the folded kernel) must reproduce the reference
    execution order (df_gan.py:199-204) to float rounding."""
    cfg = make_cfg(64)
    rng = jax.random.PRNGKey(7)
    noise = jax.random.normal(jax.random.PRNGKey(1), (2, 100))
    sent = jax.random.normal(jax.random.PRNGKey(2), (2, 256))
    ref_model = df_gan.NetG(cfg, fuse_upsample=False)
    variables = ref_model.init(rng, noise, sent)  # identical param tree
    want = ref_model.apply(variables, noise, sent)
    got = df_gan.NetG(cfg, fuse_upsample=True).apply(variables, noise, sent)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_fused_upsample_gradients_match_unfused():
    cfg = make_cfg(64)
    noise = jax.random.normal(jax.random.PRNGKey(3), (2, 100))
    sent = jax.random.normal(jax.random.PRNGKey(4), (2, 256))
    variables = df_gan.NetG(cfg, fuse_upsample=False).init(
        jax.random.PRNGKey(5), noise, sent
    )

    def loss(params, fuse):
        out = df_gan.NetG(cfg, fuse_upsample=fuse).apply({"params": params}, noise, sent)
        return jnp.sum(out * out)

    g_ref = jax.jit(jax.grad(lambda p: loss(p, False)))(variables["params"])
    g_fused = jax.jit(jax.grad(lambda p: loss(p, True)))(variables["params"])
    flat_ref, _ = jax.tree_util.tree_flatten(g_ref)
    flat_fused, _ = jax.tree_util.tree_flatten(g_fused)
    for a, b in zip(flat_ref, flat_fused):
        a, b = np.asarray(a), np.asarray(b)
        # reassociation-aware tolerance: absolute floor scaled to the leaf
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=1e-4 * max(np.abs(a).max(), 1.0))


def test_fold_upsample_kernel_identity():
    """conv3x3(pad1)(up2x(x)) == lhs-dilated conv with the folded 4x4 kernel."""
    from jax import lax

    from xmc_gan_tpu.ops.modules import fold_upsample_kernel, upsample_nearest_2x

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 5, 7, 3), jnp.float32)
    k3 = jnp.asarray(rs.randn(3, 3, 3, 4), jnp.float32)
    want = lax.conv_general_dilated(
        upsample_nearest_2x(x), k3, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = lax.conv_general_dilated(
        x, fold_upsample_kernel(k3), (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("spec_norm", [False, True])
def test_resd_fused_downsample_matches_unfused(spec_norm):
    """The shortcut's 1x1 conv commutes with the 2x2 average pool, so the
    fused block (pool first, conv at 1/4 the elements) matches the reference
    ordering bit-for-nearly (same parameters either way)."""
    rs = np.random.RandomState(7)
    x = jnp.asarray(rs.randn(2, 16, 16, 12), jnp.float32)
    ref_blk = df_gan.ResD(in_dim=12, out_dim=24, downsample=True,
                          spec_norm=spec_norm, he_init=True,
                          fuse_downsample=False)
    variables = ref_blk.init(jax.random.PRNGKey(0), x)
    want = np.asarray(ref_blk.apply(variables, x))
    fused = df_gan.ResD(in_dim=12, out_dim=24, downsample=True,
                        spec_norm=spec_norm, he_init=True)
    got = np.asarray(fused.apply(variables, x))
    assert got.shape == (2, 8, 8, 24)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_concept_resd_fused_downsample_matches_unfused():
    from xmc_gan_tpu.models import df_concept_gan

    rs = np.random.RandomState(11)
    x = jnp.asarray(rs.randn(2, 16, 16, 12), jnp.float32)
    ref_blk = df_concept_gan.ConceptResD(
        in_dim=12, out_dim=24, downsample=True, normalize=True,
        spec_norm=True, he_init=True, fuse_downsample=False)
    variables = ref_blk.init(jax.random.PRNGKey(0), x)
    want = np.asarray(ref_blk.apply(variables, x))
    fused = df_concept_gan.ConceptResD(
        in_dim=12, out_dim=24, downsample=True, normalize=True,
        spec_norm=True, he_init=True)
    got = np.asarray(fused.apply(variables, x))
    assert got.shape == (2, 8, 8, 24)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
