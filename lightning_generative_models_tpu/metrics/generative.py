"""Generative metrics: FID, KID, Inception Score.

Replaces the reference's torchmetrics usage (reference: gan.py:132-241,
infogan.py:378-427): update(real/fake uint8 batches) / compute() / reset()
semantics, identical [-1,1] -> uint8 ingestion convention upstream
(the trainer quantizes with the same round-trip the reference used), KID with
``subset_size`` subsets, IS with class-conditional KL.

The feature extractor is pluggable; default is the Flax InceptionV3
(metrics/inception.py). Frechet distance uses the symmetric
``sqrtm(S1^1/2 S2 S1^1/2)`` eigen-decomposition form (PSD-stable, no scipy).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import numpy as np


def matrix_sqrt_psd(mat: np.ndarray) -> np.ndarray:
    """Symmetric PSD matrix square root via eigendecomposition."""
    vals, vecs = np.linalg.eigh(mat)
    vals = np.clip(vals, 0.0, None)
    return (vecs * np.sqrt(vals)) @ vecs.T


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray
) -> float:
    """||mu1-mu2||^2 + Tr(S1 + S2 - 2 sqrtm(S1 S2)) via the symmetric form."""
    diff = mu1 - mu2
    s1_half = matrix_sqrt_psd(sigma1)
    covmean = matrix_sqrt_psd(s1_half @ sigma2 @ s1_half)
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


class _FeatureMetric:
    def __init__(self, feature_extractor: Optional[Callable] = None):
        if feature_extractor is None:
            from lightning_generative_models_tpu.metrics.inception import (
                InceptionFeatureExtractor,
            )

            feature_extractor = InceptionFeatureExtractor()
        self.extract = feature_extractor
        self.reset()

    def reset(self) -> None:
        self._real: List[np.ndarray] = []
        self._fake: List[np.ndarray] = []

    def _features(self, images_u8) -> np.ndarray:
        feats, _ = self.extract(images_u8)
        return feats

    def update(self, images_u8, real: bool) -> None:
        (self._real if real else self._fake).append(self._features(images_u8))


class FrechetInceptionDistance(_FeatureMetric):
    def compute(self) -> float:
        real = np.concatenate(self._real)
        fake = np.concatenate(self._fake)
        mu1, mu2 = real.mean(0), fake.mean(0)
        s1 = np.cov(real, rowvar=False)
        s2 = np.cov(fake, rowvar=False)
        return frechet_distance(mu1, s1, mu2, s2)


def polynomial_kernel(x: np.ndarray, y: np.ndarray, degree=3, gamma=None, coef=1.0):
    gamma = gamma if gamma is not None else 1.0 / x.shape[1]
    return (x @ y.T * gamma + coef) ** degree


def _mmd2(x: np.ndarray, y: np.ndarray) -> float:
    """Unbiased squared MMD with the polynomial kernel (torchmetrics KID)."""
    m = x.shape[0]
    k_xx = polynomial_kernel(x, x)
    k_yy = polynomial_kernel(y, y)
    k_xy = polynomial_kernel(x, y)
    diag_x = np.trace(k_xx)
    diag_y = np.trace(k_yy)
    term_xx = (k_xx.sum() - diag_x) / (m * (m - 1))
    term_yy = (k_yy.sum() - diag_y) / (m * (m - 1))
    term_xy = k_xy.mean()
    return float(term_xx + term_yy - 2 * term_xy)


class KernelInceptionDistance(_FeatureMetric):
    def __init__(
        self,
        feature_extractor: Optional[Callable] = None,
        subset_size: int = 100,
        subsets: int = 10,
        seed: int = 0,
    ):
        self.subset_size = subset_size
        self.subsets = subsets
        self.seed = seed
        super().__init__(feature_extractor)

    def compute(self) -> Tuple[float, float]:
        real = np.concatenate(self._real)
        fake = np.concatenate(self._fake)
        n = min(len(real), len(fake))
        size = min(self.subset_size, n)
        rs = np.random.RandomState(self.seed)
        values = []
        for _ in range(self.subsets):
            ri = rs.choice(len(real), size, replace=False)
            fi = rs.choice(len(fake), size, replace=False)
            values.append(_mmd2(real[ri], fake[fi]))
        return float(np.mean(values)), float(np.std(values))


class InceptionScore:
    def __init__(self, feature_extractor: Optional[Callable] = None, splits: int = 10):
        if feature_extractor is None:
            from lightning_generative_models_tpu.metrics.inception import (
                InceptionFeatureExtractor,
            )

            feature_extractor = InceptionFeatureExtractor()
        self.extract = feature_extractor
        self.splits = splits
        self.reset()

    def reset(self) -> None:
        self._probs: List[np.ndarray] = []

    def update(self, images_u8) -> None:
        _, logits = self.extract(images_u8)
        logits = logits - logits.max(axis=1, keepdims=True)
        exp = np.exp(logits)
        self._probs.append(exp / exp.sum(axis=1, keepdims=True))

    def compute(self) -> Tuple[float, float]:
        probs = np.concatenate(self._probs)
        scores = []
        for chunk in np.array_split(probs, self.splits):
            marginal = chunk.mean(axis=0, keepdims=True)
            kl = chunk * (np.log(chunk + 1e-10) - np.log(marginal + 1e-10))
            scores.append(np.exp(kl.sum(axis=1).mean()))
        return float(np.mean(scores)), float(np.std(scores))
