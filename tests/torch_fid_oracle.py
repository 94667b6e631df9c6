"""Independent PyTorch transliteration of pytorch_fid's end-to-end FID pipeline.

The reference computes its headline metric with
``pytorch_fid.calculate_fid_given_paths([org_dir, fake_dir], bs, cuda, dims=2048)``
(reference ``train_gan.py:389``).  pytorch_fid is not installed in this image,
so this module restates its *entire* numeric pipeline (fid_score.py of
pytorch-fid 0.3.x) in plain torch/numpy/scipy, feeding on in-memory uint8
image arrays instead of PNG files on disk:

1. image loading: PIL → ``transforms.ToTensor()`` ⇒ uint8/255 in [0,1], NCHW
   (here: the uint8 array divided by 255 — the identical value ToTensor yields
   after the PNG round-trip, since PNG is lossless uint8);
2. the InceptionV3 wrapper's input stage: ``F.interpolate(x, size=(299, 299),
   mode='bilinear', align_corners=False)`` then ``2*x - 1``;
3. pool3 features (2048-dim; the oracle topology in torch_inception_oracle.py
   with pytorch_fid's FID-variant pooling quirks ends in the equivalent
   ``adaptive_avg_pool2d(·, 1)``);
4. ``mu = act.mean(0)``, ``sigma = np.cov(act, rowvar=False)`` (ddof=1);
5. ``calculate_frechet_distance(mu1, s1, mu2, s2, eps=1e-6)`` verbatim
   semantics, including the non-finite eps-offset retry and the
   imaginary-component tolerance check.

Together with ``torch_inception_oracle.InceptionV3Pool3`` this is a complete,
framework-independent statement of the reference's FID number: the only piece
it cannot certify in this environment is the pretrained weights file itself
(absent here — see BASELINE.md), which the parity test sidesteps by running
*the same* random-init weights through both stacks.
"""

import numpy as np
import torch
import torch.nn.functional as F
from scipy import linalg


def get_activations(images_uint8: np.ndarray, model, batch_size: int = 16) -> np.ndarray:
    """pytorch_fid's activation pass over an in-memory uint8 NHWC image set.

    Mirrors fid_score.get_activations + the InceptionV3 wrapper forward
    (resize_input=True, normalize_input=True), minus the dataloader/PNG I/O
    that a lossless uint8 round-trip makes value-identical.
    """
    assert images_uint8.dtype == np.uint8 and images_uint8.ndim == 4
    model.eval()
    acts = []
    with torch.no_grad():
        for i in range(0, images_uint8.shape[0], batch_size):
            chunk = images_uint8[i : i + batch_size]
            # ToTensor: uint8 HWC -> float CHW in [0, 1]
            x = torch.from_numpy(chunk).permute(0, 3, 1, 2).float() / 255.0
            if x.shape[-2:] != (299, 299):
                x = F.interpolate(x, size=(299, 299), mode="bilinear", align_corners=False)
            x = 2 * x - 1
            acts.append(model(x).numpy())
    return np.concatenate(acts, axis=0)


def calculate_activation_statistics(act: np.ndarray):
    mu = np.mean(act, axis=0)
    sigma = np.cov(act, rowvar=False)
    return mu, sigma


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Verbatim semantics of pytorch_fid.fid_score.calculate_frechet_distance."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    assert mu1.shape == mu2.shape and sigma1.shape == sigma2.shape
    diff = mu1 - mu2

    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real
    tr_covmean = np.trace(covmean)
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * tr_covmean)


def calculate_fid_given_images(
    images_a_uint8: np.ndarray,
    images_b_uint8: np.ndarray,
    model,
    batch_size: int = 16,
) -> float:
    """pytorch_fid.calculate_fid_given_paths with the PNG directories replaced
    by in-memory uint8 sets (the arrays the reference would have written to
    disk at ``train_gan.py:367-382``)."""
    mu1, s1 = calculate_activation_statistics(get_activations(images_a_uint8, model, batch_size))
    mu2, s2 = calculate_activation_statistics(get_activations(images_b_uint8, model, batch_size))
    return calculate_frechet_distance(mu1, s1, mu2, s2)
