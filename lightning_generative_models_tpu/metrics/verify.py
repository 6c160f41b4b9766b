"""FID numeric-parity verifier: ``python -m lightning_generative_models_tpu.metrics.verify``.

The reference computes FID/KID/IS through torchmetrics' pretrained
InceptionV3 (/root/reference/models/generative/gan/gan.py:132-241). This
environment has no egress to fetch the 91 MB checkpoint, so parity is proven
in two stages:

1. ALWAYS (offline-safe): build a seed-pinned torch InceptionV3 in the exact
   torchvision layout (tests/torch_inception_ref.py), convert its state_dict
   through ``load_torch_weights``, and compute FID over a fixed synthetic
   image set with BOTH the torch pipeline and this framework's pipeline. The
   two numbers must agree — this validates every stage of the FID path
   (architecture, converter, resize/normalize ingestion, mu/sigma/sqrtm).

2. WITH A WEIGHTS FILE: if ``pt_inception-2015-12-05.pth`` (pytorch-fid, the
   checkpoint torchmetrics uses) is present at any search path, it is loaded
   and a real FID is computed — numbers are then directly comparable to the
   reference's. Otherwise this prints exactly what file to drop where.

Download (on a machine with egress):
    https://github.com/mseitzer/pytorch-fid/releases/download/fid_weights/pt_inception-2015-12-05.pth
"""

from __future__ import annotations

import sys

import numpy as np


def _fixed_image_sets(n=64, size=32, seed=123):
    """Two genuinely different distributions so the FID is far from zero:
    smooth low-frequency blobs vs hard-binarized noise."""
    rs = np.random.RandomState(seed)
    # real: bilinear-upsampled 4x4 noise (smooth images)
    small = rs.rand(n, 4, 4, 3)
    idx = np.linspace(0, 3, size)
    lo = np.floor(idx).astype(int)
    hi = np.minimum(lo + 1, 3)
    # simple separable bilinear
    a = small[:, lo][:, :, lo]  # nearest corners
    b = small[:, hi][:, :, lo]
    c = small[:, lo][:, :, hi]
    d = small[:, hi][:, :, hi]
    wy = (idx - lo)[None, :, None, None]
    wx = (idx - lo)[None, None, :, None]
    real = (
        a * (1 - wy) * (1 - wx) + b * wy * (1 - wx) + c * (1 - wy) * wx
        + d * wy * wx
    )
    real = (real * 255).astype(np.uint8)
    # fake: hard black/white binarized noise (high-frequency)
    fake = (rs.rand(n, size, size, 3) > 0.5).astype(np.uint8) * 255
    return real, fake


def torch_pipeline_fid(tmodel, real_u8: np.ndarray, fake_u8: np.ndarray) -> float:
    """FID via the torch model using torchmetrics' ingestion + formula."""
    import torch

    from lightning_generative_models_tpu.metrics.generative import (
        frechet_distance,
    )

    def feats(images_u8):
        x = torch.tensor(images_u8.transpose(0, 3, 1, 2)).float() / 255.0
        x = torch.nn.functional.interpolate(
            x, size=(299, 299), mode="bilinear", align_corners=False
        )
        x = x * 2.0 - 1.0
        with torch.no_grad():
            f, _ = tmodel(x)
        return f.numpy()

    fr, ff = feats(real_u8), feats(fake_u8)
    return frechet_distance(
        fr.mean(0), np.cov(fr, rowvar=False), ff.mean(0), np.cov(ff, rowvar=False)
    )


def jax_pipeline_fid(variables, real_u8: np.ndarray, fake_u8: np.ndarray) -> float:
    from lightning_generative_models_tpu.metrics import FrechetInceptionDistance
    from lightning_generative_models_tpu.metrics.inception import (
        InceptionFeatureExtractor,
    )

    fid = FrechetInceptionDistance(InceptionFeatureExtractor(params=variables))
    fid.update(real_u8, real=True)
    fid.update(fake_u8, real=False)
    return fid.compute()


def verify_converter_path(tol: float = 0.5) -> float:
    """Stage 1: prove torch-vs-jax FID agreement through the converter."""
    import tempfile
    from pathlib import Path

    import torch

    sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "tests"))
    from torch_inception_ref import TorchInceptionV3

    from lightning_generative_models_tpu.metrics.inception import (
        load_torch_weights,
    )

    torch.manual_seed(0)
    tmodel = TorchInceptionV3().eval()
    # torch's default conv init undershoots He by ~0.58x/layer; over 94
    # layers the signal collapses to ~1e-7 and every image maps to the same
    # feature vector (FID trivially 0 for both pipelines — proves nothing).
    # He-init keeps activations alive and input-dependent.
    for mod in tmodel.modules():
        if isinstance(mod, torch.nn.Conv2d):
            torch.nn.init.kaiming_normal_(
                mod.weight, mode="fan_in", nonlinearity="relu"
            )
    with tempfile.TemporaryDirectory() as d:
        sd = Path(d) / "inception.pt"
        torch.save(tmodel.state_dict(), sd)
        variables = load_torch_weights(str(sd))

    real, fake = _fixed_image_sets()
    fid_torch = torch_pipeline_fid(tmodel, real, fake)
    fid_jax = jax_pipeline_fid(variables, real, fake)
    delta = abs(fid_torch - fid_jax)
    tol = max(tol, 0.01 * abs(fid_torch))
    print(f"[stage 1] torch-pipeline FID = {fid_torch:.6f}")
    print(f"[stage 1] jax-pipeline FID   = {fid_jax:.6f}  (|delta| = {delta:.6f})")
    if delta > tol:
        raise SystemExit(
            f"FID pipelines disagree by {delta:.4f} (> {tol}); converter or "
            "ingestion drift — run tests/test_metrics.py for the failing stage."
        )
    print("[stage 1] PASS: architecture + converter + ingestion + formula agree.")
    return fid_jax


def verify_pretrained() -> int:
    """Stage 2: real FID with the pytorch-fid checkpoint, if present."""
    from lightning_generative_models_tpu.metrics.inception import (
        InceptionFeatureExtractor,
        find_pretrained_weights,
        weight_search_paths,
    )

    ckpt = find_pretrained_weights()
    if ckpt is None:
        print("[stage 2] no pretrained checkpoint found. To enable absolute")
        print("          (reference-comparable) FID, download on a machine with egress:")
        print("  https://github.com/mseitzer/pytorch-fid/releases/download/"
              "fid_weights/pt_inception-2015-12-05.pth")
        print("and drop it at one of:")
        for p in weight_search_paths():
            print(f"  {p}")
        return 1

    extractor = InceptionFeatureExtractor()
    assert extractor.pretrained
    real, fake = _fixed_image_sets()
    from lightning_generative_models_tpu.metrics import FrechetInceptionDistance

    fid = FrechetInceptionDistance(extractor)
    fid.update(real, real=True)
    fid.update(fake, real=False)
    print(f"[stage 2] pretrained FID on the fixed set = {fid.compute():.4f}")
    print(f"[stage 2] PASS: absolute FID is live (weights: {ckpt}).")
    return 0


def main() -> int:
    verify_converter_path()
    return verify_pretrained()


if __name__ == "__main__":
    sys.exit(main())
