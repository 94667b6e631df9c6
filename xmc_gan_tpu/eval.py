"""Evaluation: jitted sampling + Fréchet Inception Distance.

Reference ``eval`` (``train_gan.py:338-396``): generate ``num_samples=6000``
test images with fresh noise, save PNGs per key (originals saved once), then
``pytorch_fid.calculate_fid_given_paths([org, fake], bs=100, dims=2048)`` —
a disk round-trip through PNG files and a separate InceptionV3 pass.

TPU-native design: generated images stay on device and stream straight through
the jitted Inception feature extractor; FID statistics are accumulated as
running (sum, outer-product-sum, count) — O(D^2) memory, single pass — and
reduced across hosts before the final host-side sqrtm.  PNG saving is optional
(kept for artifact parity, off the hot path).

Weights: ``FID_WEIGHTS_PATH`` env var or ``weights_path=`` pointing at either
a torch checkpoint (torchvision ``inception_v3`` or pytorch_fid — identical
tensor names, ``utils/convert`` handles both) or a pre-converted ``.npz``
written by ``cli convert-fid-weights`` (torch-free load).  Without weights,
``FidComputer`` falls back to a fixed-seed random-init Inception —
self-consistent for relative tracking in smoke runs, clearly flagged, never
comparable to published FID numbers.

Protocols: ``evaluate_fid`` is the reference's 6,000-sample eval
(``train_gan.py:386-387``); ``evaluate_fid_30k`` is the XMC-GAN paper's
FID-30K — 30,000 generated samples (captions re-drawn from the test split
with fresh noise each pass) against the statistics of the full test set.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from xmc_gan_tpu.config import Config
from xmc_gan_tpu.models.inception import (
    InceptionV3,
    inception_params_from_torch,
    preprocess,
)

__all__ = [
    "FeatureStats",
    "FidComputer",
    "fid_from_stats",
    "evaluate_fid",
    "evaluate_fid_30k",
    "save_fid_weights_npz",
    "load_fid_weights_npz",
]


def fid_from_stats(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray
) -> float:
    """Fréchet distance between two Gaussians (Heusel et al. 2017), computed
    host-side (one 2048x2048 sqrtm; pytorch_fid-equivalent numerics)."""
    from scipy import linalg

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        eps = 1e-6
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


class FeatureStats:
    """Streaming mean/covariance over feature batches.  Sums accumulate
    host-side in float64 (jax default config has x64 disabled; features are
    only 2048 floats/sample so the D2H copy is noise)."""

    def __init__(self, dim: int):
        self.dim = dim
        self.n = 0
        self._sum = np.zeros((dim,), np.float64)
        self._outer = np.zeros((dim, dim), np.float64)

    def update(self, feats) -> None:
        f = np.asarray(feats, np.float64)
        self.n += int(f.shape[0])
        self._sum += f.sum(axis=0)
        self._outer += f.T @ f

    def finalize(self, all_reduce: bool = True) -> tuple[np.ndarray, np.ndarray]:
        total, s, o = self.n, self._sum, self._outer
        if all_reduce and jax.process_count() > 1:
            from jax.experimental import multihost_utils

            gathered = multihost_utils.process_allgather(
                {"n": np.asarray(total), "sum": s, "outer": o}
            )
            total = int(np.sum(gathered["n"]))
            s = np.sum(gathered["sum"], axis=0)
            o = np.sum(gathered["outer"], axis=0)
        if total < 2:
            raise ValueError(f"Need >= 2 samples for covariance, got {total}")
        mu = s / total
        sigma = (o - total * np.outer(mu, mu)) / (total - 1)
        return mu, sigma


def save_fid_weights_npz(variables: dict, path: str) -> None:
    """Converted Inception variables -> flat ``.npz`` ('/'-joined paths) so the
    FID extractor loads without torch in the training environment
    (``cli convert-fid-weights``)."""
    flat = {}
    for key_path, leaf in jax.tree_util.tree_leaves_with_path(variables):
        name = "/".join(k.key for k in key_path)
        flat[name] = np.asarray(leaf, np.float32)
    np.savez(path, **flat)


def load_fid_weights_npz(path: str) -> dict:
    data = np.load(path)
    tree: dict = {}
    for name in data.files:
        node = tree
        *parents, leaf = name.split("/")
        for p in parents:
            node = node.setdefault(p, {})
        node[leaf] = data[name]
    return tree


class FidComputer:
    """Jitted Inception pool3 features + streaming stats + final FID."""

    DIM = 2048

    def __init__(self, weights_path: str | None = None, batch_size: int = 100):
        self.batch_size = batch_size
        self.model = InceptionV3(fid_variant=True)
        weights_path = weights_path or os.environ.get("FID_WEIGHTS_PATH", "")
        self.pretrained = bool(weights_path) and os.path.isfile(weights_path)
        if self.pretrained and weights_path.endswith(".npz"):
            self.variables = jax.tree.map(
                jnp.asarray, load_fid_weights_npz(weights_path)
            )
        elif self.pretrained:
            from xmc_gan_tpu.utils.convert import load_state_dict

            self.variables = jax.tree.map(
                jnp.asarray, inception_params_from_torch(load_state_dict(weights_path))
            )
        else:
            # deterministic random-init fallback: relative tracking only
            dummy = jnp.zeros((1, 299, 299, 3), jnp.float32)
            self.variables = self.model.init(jax.random.PRNGKey(2015), dummy)

        @jax.jit
        def raw_features(images):
            from xmc_gan_tpu.ops.images import to_unit_range

            return self.model.apply(self.variables, preprocess(to_unit_range(images)))

        if self.pretrained:
            self._features = raw_features
        else:
            # random-init BN squashes activations to ~1e-4 scale, making FID
            # values vanish; standardize per-dim against a fixed probe batch
            # so relative comparisons live at a readable magnitude.
            probe = jax.random.uniform(
                jax.random.PRNGKey(7), (16, 128, 128, 3), jnp.float32, -1, 1
            )
            f = raw_features(probe)
            mu = jnp.mean(f, axis=0)
            sd = jnp.maximum(jnp.std(f, axis=0), 1e-8)

            @jax.jit
            def features(images):
                return (raw_features(images) - mu) / sd

            self._features = features

    def stats(self) -> FeatureStats:
        return FeatureStats(self.DIM)

    def update(self, stats: FeatureStats, images) -> None:
        """``images``: NHWC batch, uint8 (loader-native; normalized on device)
        or [-1, 1] float (generator output).  Any spatial size."""
        stats.update(self._features(jnp.asarray(images)))

    def fid(self, real: FeatureStats, fake: FeatureStats) -> float:
        mu_r, sig_r = real.finalize()
        mu_f, sig_f = fake.finalize()
        return fid_from_stats(mu_r, sig_r, mu_f, sig_f)


def evaluate_fid(
    cfg: Config,
    g_params,
    encode_fn: Callable,
    test_loader: Iterable,
    *,
    num_samples: int = 6000,
    seed: int = 0,
    save_dir: str | None = None,
    org_dir: str | None = None,
    fid: FidComputer | None = None,
    sample_fn: Callable | None = None,
) -> float:
    """The reference eval loop (``train_gan.py:338-396``) without the disk
    round-trip: per test batch, fresh noise -> G -> features; real images
    stream through the same extractor.  Optional PNG dirs keep the reference's
    image artifacts (``{save_dir}/{key}.png``)."""
    from xmc_gan_tpu.train import make_sample_fn

    fid = fid or FidComputer()
    sample_fn = sample_fn or make_sample_fn(cfg)
    real_stats, fake_stats = fid.stats(), fid.stats()
    rng = jax.random.PRNGKey(seed)
    done = 0
    for batch in test_loader:
        words, sent, mask = encode_fn(batch)
        bs = sent.shape[0]
        rng, nrng = jax.random.split(rng)
        noise = jax.random.normal(nrng, (bs, cfg.TRAIN.NOISE_DIM), jnp.float32)
        fake = sample_fn(g_params, noise, sent, words, mask)
        fid.update(fake_stats, fake)
        fid.update(real_stats, jnp.asarray(batch["imgs"]))
        if save_dir:
            from xmc_gan_tpu.utils.miscc import save_images

            save_images(np.asarray(fake), batch["keys"], save_dir)
        if org_dir:
            from xmc_gan_tpu.utils.miscc import save_images

            save_images(np.asarray(batch["imgs"]), batch["keys"], org_dir)
        done += bs * jax.process_count()
        if done >= num_samples:  # reference stops at 6000 (train_gan.py:386-387)
            break
    return fid.fid(real_stats, fake_stats)


def evaluate_fid_30k(
    cfg: Config,
    g_params,
    encode_fn: Callable,
    test_loader: Iterable,
    *,
    num_samples: int = 30000,
    seed: int = 0,
    fid: FidComputer | None = None,
    sample_fn: Callable | None = None,
) -> float:
    """XMC-GAN paper protocol: FID over 30,000 generated samples vs the
    statistics of the *full* test split.

    The test split is cycled (``set_epoch`` re-draws nothing — captions repeat
    across passes, which is how 30k samples come from COCO's ~5k val images)
    with fresh noise per batch and per pass, so repeated captions produce
    distinct samples.  Real statistics accumulate during the first pass only.
    Distinct from ``evaluate_fid`` (the reference's 6,000-sample protocol)
    by construction, not by parameter: real coverage is complete and fake
    sampling is with-replacement.
    """
    from xmc_gan_tpu.train import make_sample_fn

    fid = fid or FidComputer()
    sample_fn = sample_fn or make_sample_fn(cfg)
    real_stats, fake_stats = fid.stats(), fid.stats()
    rng = jax.random.PRNGKey(seed)
    done = 0
    first_pass = True
    while done < num_samples:
        saw_batch = False
        for batch in test_loader:
            saw_batch = True
            words, sent, mask = encode_fn(batch)
            bs = sent.shape[0]
            rng, nrng = jax.random.split(rng)
            noise = jax.random.normal(nrng, (bs, cfg.TRAIN.NOISE_DIM), jnp.float32)
            fake = sample_fn(g_params, noise, sent, words, mask)
            fid.update(fake_stats, fake)
            if first_pass:
                fid.update(real_stats, jnp.asarray(batch["imgs"]))
            done += bs * jax.process_count()
            if done >= num_samples:
                break
        if not saw_batch:
            raise ValueError("empty test loader")
        first_pass = False
    return fid.fid(real_stats, fake_stats)
