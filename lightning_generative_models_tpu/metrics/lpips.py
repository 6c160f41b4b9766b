"""LPIPS perceptual distance (VGG16 backbone) in Flax — the VQGAN loss term.

The reference's VQGAN imports the taming package (reference:
models/generative/vae/vqgan.py:8-14), whose training recipe is adversarial +
*perceptual* reconstruction; the perceptual half is LPIPS (Zhang et al. 2018,
arXiv:1801.03924) over VGG16 features. This environment has no egress, so the
inception precedent (metrics/inception.py) applies verbatim:

- the architecture is implemented here in idiomatic Flax/NHWC,
- ``load_torch_lpips`` converts a locally provided torch state_dict — either
  a full ``lpips.LPIPS(net='vgg')`` dump (``net.slice*`` backbone +
  ``lin*.model.1.weight`` heads) or a torchvision ``vgg16`` features
  state_dict (``features.N.weight``; lin heads then default to uniform),
- a drop-in path is sha256-pinnable via ``LGM_TPU_LPIPS_SHA256``,
- without weights the network runs deterministic He-scaled random init:
  distances are then self-consistent for *relative* use (a valid
  perceptual-ish training signal — random VGG features still encode local
  structure) but not comparable to published LPIPS numbers.

Math parity with the lpips package: input in [-1, 1] is normalized by the
ImageNet shift/scale constants, per-tap features are unit-normalized over
channels (eps added to the norm, not inside the sqrt), squared differences
are channel-weighted by the non-negative lin heads and spatially averaged,
and the five tap terms sum.
"""

from __future__ import annotations

import logging
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

# VGG16 feature blocks: (channels, conv count); LPIPS taps the last ReLU of
# each block (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3).
VGG_CFG = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
TAP_CHANNELS = tuple(c for c, _ in VGG_CFG)

# lpips.ScalingLayer constants (input in [-1, 1]).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 convolutional trunk returning the five LPIPS tap activations."""

    @nn.compact
    def __call__(self, x: jax.Array) -> Sequence[jax.Array]:
        taps = []
        for block_idx, (feats, n_convs) in enumerate(VGG_CFG):
            for _ in range(n_convs):
                x = nn.relu(
                    nn.Conv(feats, (3, 3), padding=((1, 1), (1, 1)))(x)
                )
            taps.append(x)
            if block_idx < len(VGG_CFG) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


def lpips_distance(variables: Any, x: jax.Array, y: jax.Array) -> jax.Array:
    """Per-example LPIPS distance between ``x`` and ``y``.

    ``x``/``y``: [b, h, w, c] in [-1, 1] (grayscale is broadcast to RGB).
    ``variables``: ``{"vgg": <VGG16Features params>, "lins": (w0..w4)}``.
    Differentiable and jittable — this is the VQGAN loss term.
    """
    vgg = VGG16Features()

    def prep(img):
        if img.shape[-1] == 1:
            img = jnp.repeat(img, 3, axis=-1)
        return (img - _SHIFT) / _SCALE

    taps_x = vgg.apply({"params": variables["vgg"]}, prep(x))
    taps_y = vgg.apply({"params": variables["vgg"]}, prep(y))

    total = 0.0
    for fx, fy, w in zip(taps_x, taps_y, variables["lins"]):
        nx = fx / (jnp.linalg.norm(fx, axis=-1, keepdims=True) + 1e-10)
        ny = fy / (jnp.linalg.norm(fy, axis=-1, keepdims=True) + 1e-10)
        diff = (nx - ny) ** 2
        # Non-negative 1x1 head (the trained lin weights are non-negative;
        # relu guards converted/random weights the same way lpips' use of
        # them assumes).
        weighted = jnp.sum(diff * nn.relu(w), axis=-1)  # [b, h, w]
        total = total + jnp.mean(weighted, axis=(1, 2))
    return total


def weight_search_paths():
    import os
    from pathlib import Path

    paths = []
    env = os.environ.get("LGM_TPU_LPIPS_WEIGHTS")
    if env:
        paths.append(Path(env))
    repo_root = Path(__file__).resolve().parents[2]
    paths += [
        repo_root / "weights" / "lpips_vgg.pth",
        Path.home() / ".cache" / "lgm_tpu" / "lpips_vgg.pth",
    ]
    return paths


def find_pretrained_weights():
    """First existing LPIPS/VGG16 weights file, sha256-pinnable via
    ``LGM_TPU_LPIPS_SHA256`` (prefix match, torch.hub style)."""
    import hashlib
    import os

    expected = os.environ.get("LGM_TPU_LPIPS_SHA256", "").lower()
    if expected and len(expected) < 8:
        raise ValueError(
            "LGM_TPU_LPIPS_SHA256 must be at least 8 hex chars (torch.hub "
            f"pins use >=8); got {len(expected)} — a too-short prefix "
            "matches almost anything and defeats the pin."
        )
    for p in weight_search_paths():
        if p.exists():
            if expected:
                digest = hashlib.sha256(p.read_bytes()).hexdigest()
                if not digest.startswith(expected):
                    raise ValueError(
                        f"LPIPS weights at {p} have sha256 {digest}, which "
                        f"does not match LGM_TPU_LPIPS_SHA256={expected}. "
                        "Re-download the file (docs/FID.md, LPIPS section)."
                    )
            return p
    return None


def he_scaled_random_variables(seed: int = 0):
    """Deterministic random-init fallback (no weights available offline).

    Conv kernels are He-scaled (x sqrt(2)) for the same reason as
    metrics/inception.py: lecun init halves activation variance per ReLU
    layer and the deep taps would collapse toward constants. Lin heads are
    uniform 1/C so every channel contributes equally.
    """
    module = VGG16Features()
    params = module.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 32, 32, 3))
    )["params"]
    params = jax.tree_util.tree_map_with_path(
        lambda path, leaf: (
            leaf * np.sqrt(2.0).astype(leaf.dtype)
            if getattr(path[-1], "key", "") == "kernel" else leaf
        ),
        params,
    )
    lins = tuple(
        jnp.full((c,), 1.0 / c, jnp.float32) for c in TAP_CHANNELS
    )
    return {"vgg": params, "lins": lins}


def _natural_key(s: str):
    import re

    return [int(p) if p.isdigit() else p for p in re.split(r"(\d+)", s)]


def load_torch_lpips(path: str) -> Any:
    """Convert a torch state_dict into LPIPS variables.

    Accepts either format:
    - a full ``lpips.LPIPS(net='vgg')`` state_dict: backbone convs under
      ``net.slice{1..5}.{idx}.weight/bias`` + heads ``lin{i}.model.1.weight``;
    - a torchvision ``vgg16`` state_dict: convs under ``features.{idx}.*``
      (only the 13 feature convs are read); heads default to uniform 1/C.

    Conv weights OIHW -> HWIO. The 13 convs are paired with the Flax
    ``Conv_0..Conv_12`` modules in natural (declaration) order — both
    definitions enumerate the VGG16 trunk in the same sequence.
    """
    import torch

    # Plain state_dicts (both accepted formats) load under the safe
    # weights_only path; only fall back to full unpickling for files that
    # store a whole nn.Module (arbitrary-code risk — keep it last resort).
    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        logger.warning(
            "%s is not a plain state_dict; falling back to "
            "weights_only=False torch.load (executes pickle code — only "
            "use weight files you trust, ideally sha256-pinned via "
            "LGM_TPU_LPIPS_SHA256).", path,
        )
        sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                        else v) for k, v in sd.items()}

    conv_keys = sorted(
        (k for k in sd
         if (k.startswith("net.slice") or k.startswith("features."))
         and k.endswith(".weight") and sd[k].ndim == 4),
        key=_natural_key,
    )
    if len(conv_keys) < 13:
        raise ValueError(
            f"{path} holds {len(conv_keys)} conv weights; a VGG16 trunk "
            "needs 13 (is this a lin-only lpips checkpoint? It must be "
            "merged with a torchvision vgg16 state_dict — docs/FID.md)."
        )
    conv_keys = conv_keys[:13]

    params = {}
    for i, wk in enumerate(conv_keys):
        bk = wk[: -len("weight")] + "bias"
        entry = {"kernel": jnp.asarray(sd[wk].transpose(2, 3, 1, 0))}
        if bk in sd:
            entry["bias"] = jnp.asarray(sd[bk])
        params[f"Conv_{i}"] = entry

    lins = []
    for i, c in enumerate(TAP_CHANNELS):
        key = f"lin{i}.model.1.weight"
        if key in sd:
            lins.append(jnp.asarray(sd[key].reshape(-1)))
        else:
            lins.append(jnp.full((c,), 1.0 / c, jnp.float32))
    return {"vgg": params, "lins": tuple(lins)}


class LPIPS:
    """Weight-resolving LPIPS wrapper (inception.py precedent).

    Resolution order: explicit ``variables`` > a state_dict found at
    :func:`weight_search_paths` (converted on the fly) > deterministic
    He-scaled random init (relative-use only, loud warning).
    """

    def __init__(self, variables: Optional[Any] = None, seed: int = 0):
        self.pretrained = variables is not None
        if variables is None:
            ckpt = find_pretrained_weights()
            if ckpt is not None:
                logger.info("Loading LPIPS/VGG16 weights from %s", ckpt)
                variables = load_torch_lpips(str(ckpt))
                self.pretrained = True
        if variables is None:
            logger.warning(
                "LPIPS/VGG16 weights unavailable (offline environment): "
                "using deterministic He-scaled random init. Perceptual "
                "distances are self-consistent but NOT comparable to "
                "published LPIPS values. Drop lpips_vgg.pth at one of %s or "
                "set LGM_TPU_LPIPS_WEIGHTS (docs/FID.md, LPIPS section).",
                [str(p) for p in weight_search_paths()],
            )
            variables = he_scaled_random_variables(seed)
        self.variables = variables

    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        return lpips_distance(self.variables, x, y)
