"""InceptionV3 in Flax (NHWC) — the FID/KID/IS feature extractor.

Mirrors the pytorch-fid InceptionV3 used by torchmetrics (reference metric
mechanism: gan.py:132-241): BasicConv2d = conv(no bias) + BatchNorm(eps=1e-3)
+ ReLU; Inception A/B/C/D/E mixed blocks; 2048-d global-average-pool features
and a 1008-way logits head (for Inception Score).

Ingestion parity with torchmetrics: uint8 [0,255] -> f32/255 -> bilinear
resize to 299x299 -> scale to [-1, 1] (pt_inception's resize_input +
normalize_input path).

Weights: ``load_torch_weights(path)`` converts a locally provided
torchvision/pytorch-fid state_dict (this environment has no egress to fetch
one). Without weights the network runs with deterministic random
initialization — FID/KID values are then self-consistent for *relative*
tracking but not comparable to published numbers; callers are warned once.
"""

from __future__ import annotations

import logging
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

FEATURE_DIM = 2048
NUM_LOGITS = 1008  # TF-slim inception class count (pytorch-fid head)


class BasicConv(nn.Module):
    features: int
    kernel: tuple
    strides: tuple = (1, 1)
    padding: Any = "VALID"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides,
            padding=self.padding, use_bias=False,
        )(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3)(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1))(x)
        b2 = BasicConv(48, (1, 1))(x)
        b2 = BasicConv(64, (5, 5), padding=((2, 2), (2, 2)))(b2)
        b3 = BasicConv(64, (1, 1))(x)
        b3 = BasicConv(96, (3, 3), padding=((1, 1), (1, 1)))(b3)
        b3 = BasicConv(96, (3, 3), padding=((1, 1), (1, 1)))(b3)
        b4 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        b4 = BasicConv(self.pool_features, (1, 1))(b4)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(384, (3, 3), strides=(2, 2))(x)
        b2 = BasicConv(64, (1, 1))(x)
        b2 = BasicConv(96, (3, 3), padding=((1, 1), (1, 1)))(b2)
        b2 = BasicConv(96, (3, 3), strides=(2, 2))(b2)
        b3 = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b1, b2, b3], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv(192, (1, 1))(x)
        b2 = BasicConv(c7, (1, 1))(x)
        b2 = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)))(b2)
        b2 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)))(b2)
        b3 = BasicConv(c7, (1, 1))(x)
        b3 = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)))(b3)
        b3 = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)))(b3)
        b3 = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)))(b3)
        b3 = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)))(b3)
        b4 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        b4 = BasicConv(192, (1, 1))(b4)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(192, (1, 1))(x)
        b1 = BasicConv(320, (3, 3), strides=(2, 2))(b1)
        b2 = BasicConv(192, (1, 1))(x)
        b2 = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)))(b2)
        b2 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)))(b2)
        b2 = BasicConv(192, (3, 3), strides=(2, 2))(b2)
        b3 = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b1, b2, b3], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1))(x)
        b2 = BasicConv(384, (1, 1))(x)
        b2a = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)))(b2)
        b2b = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)))(b2)
        b2 = jnp.concatenate([b2a, b2b], axis=-1)
        b3 = BasicConv(448, (1, 1))(x)
        b3 = BasicConv(384, (3, 3), padding=((1, 1), (1, 1)))(b3)
        b3a = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)))(b3)
        b3b = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)))(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        b4 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        b4 = BasicConv(192, (1, 1))(b4)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionV3(nn.Module):
    @nn.compact
    def __call__(self, x):
        """x: f32 [B, 299, 299, 3] in [-1, 1] -> (features 2048, logits)."""
        x = BasicConv(32, (3, 3), strides=(2, 2))(x)
        x = BasicConv(32, (3, 3))(x)
        x = BasicConv(64, (3, 3), padding=((1, 1), (1, 1)))(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv(80, (1, 1))(x)
        x = BasicConv(192, (3, 3))(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32)(x)
        x = InceptionA(64)(x)
        x = InceptionA(64)(x)
        x = InceptionB()(x)
        x = InceptionC(128)(x)
        x = InceptionC(160)(x)
        x = InceptionC(160)(x)
        x = InceptionC(192)(x)
        x = InceptionD()(x)
        x = InceptionE()(x)
        x = InceptionE()(x)
        features = jnp.mean(x, axis=(1, 2))  # global average pool -> 2048
        logits = nn.Dense(NUM_LOGITS)(features)
        return features, logits


#: Search order for a locally provided pytorch-fid / torchvision InceptionV3
#: state_dict (this environment has no egress; drop the file at any of these).
def weight_search_paths():
    import os
    from pathlib import Path

    paths = []
    env = os.environ.get("LGM_TPU_INCEPTION_WEIGHTS")
    if env:
        paths.append(Path(env))
    repo_root = Path(__file__).resolve().parents[2]
    paths += [
        repo_root / "weights" / "pt_inception-2015-12-05.pth",
        Path.home() / ".cache" / "lgm_tpu" / "pt_inception-2015-12-05.pth",
    ]
    return paths


def find_pretrained_weights():
    """First existing weights file from :func:`weight_search_paths`, or None.

    If ``LGM_TPU_INCEPTION_SHA256`` is set, the file's sha256 must match
    (prefix match allowed, torch.hub style) — a corrupted or wrong download
    would otherwise silently produce non-comparable FID numbers.
    """
    import hashlib
    import os

    expected = os.environ.get("LGM_TPU_INCEPTION_SHA256", "").lower()
    if expected and len(expected) < 8:
        raise ValueError(
            "LGM_TPU_INCEPTION_SHA256 must be at least 8 hex chars "
            f"(torch.hub pins use >=8); got {len(expected)} — a too-short "
            "prefix matches almost anything and defeats the pin."
        )
    for p in weight_search_paths():
        if p.exists():
            if expected:
                digest = hashlib.sha256(p.read_bytes()).hexdigest()
                if not digest.startswith(expected):
                    raise ValueError(
                        f"InceptionV3 weights at {p} have sha256 {digest}, "
                        f"which does not match LGM_TPU_INCEPTION_SHA256="
                        f"{expected}. Re-download the file (docs/FID.md)."
                    )
            return p
    return None


def he_scaled_random_params(seed: int = 0):
    """Deterministic He-initialized random InceptionV3 variables.

    Flax's default lecun_normal conv init halves the activation variance at
    every ReLU layer; over this network's ~94 conv layers the features
    collapse to a near-constant vector and every FID trivially approaches 0
    (measured: 2e-4 on image sets whose real FID is ~374). Scaling each conv
    kernel by sqrt(2) (He) keeps features input-dependent, which makes the
    offline random-weights FID usable for *relative* tracking and gives the
    golden regression test (tests/test_metrics.py) a far-from-zero anchor.
    """
    from jax.tree_util import tree_map_with_path

    module = InceptionV3()
    params = module.init(jax.random.PRNGKey(seed), jnp.zeros((1, 299, 299, 3)))

    def he(path, leaf):
        keys = [getattr(p, "key", str(p)) for p in path]
        if keys[-1] == "kernel" and any("Conv_" in k for k in keys):
            return leaf * np.sqrt(2.0).astype(leaf.dtype)
        return leaf

    return tree_map_with_path(he, params)


class InceptionFeatureExtractor:
    """Jitted uint8 -> (features, logits) pipeline with torchmetrics parity.

    Weights resolution order: explicit ``params`` > a state_dict found at
    :func:`weight_search_paths` (converted on the fly) > deterministic random
    init (relative-tracking only, with a loud warning).
    """

    def __init__(self, params: Optional[Any] = None, seed: int = 0):
        self.module = InceptionV3()
        self.pretrained = params is not None
        if params is None:
            ckpt = find_pretrained_weights()
            if ckpt is not None:
                logger.info("Loading InceptionV3 weights from %s", ckpt)
                params = load_torch_weights(str(ckpt))
                self.pretrained = True
        if params is None:
            logger.warning(
                "InceptionV3 weights unavailable (offline environment): using "
                "deterministic He-scaled random init. FID/KID/IS values are "
                "self-consistent but NOT comparable to published numbers. "
                "Drop pt_inception-2015-12-05.pth at one of %s or set "
                "LGM_TPU_INCEPTION_WEIGHTS (see docs/FID.md).",
                [str(p) for p in weight_search_paths()],
            )
            params = he_scaled_random_params(seed)
        self.variables = params
        self._apply = jax.jit(self._forward)

    def _forward(self, images_u8: jax.Array):
        x = images_u8.astype(jnp.float32) / 255.0
        b, h, w, c = x.shape
        if c == 1:
            x = jnp.repeat(x, 3, axis=-1)
        x = jax.image.resize(x, (b, 299, 299, 3), method="bilinear")
        x = x * 2.0 - 1.0
        return self.module.apply(self.variables, x)

    def __call__(self, images_u8) -> tuple:
        feats, logits = self._apply(jnp.asarray(images_u8))
        return np.asarray(feats), np.asarray(logits)


def _natural_key(path: str):
    import re

    return [int(p) if p.isdigit() else p for p in re.split(r"(\d+)", path)]


def _ordered_paths(tree: Any, suffix: str, contains: str = ""):
    """Leaf paths ending in `suffix`, in module-creation order.

    Flax names submodules `<Type>_<i>`; natural sort of the joined path
    reproduces creation order for this architecture (stem BasicConv_0..4,
    InceptionA_0..2, B_0, C_0..3, D_0, E_0..1 — alphabetical type order ==
    call order, verified by construction)."""
    from jax.tree_util import tree_flatten_with_path

    leaves, _ = tree_flatten_with_path(tree)
    out = []
    for path, leaf in leaves:
        keys = [getattr(p, "key", str(p)) for p in path]
        joined = "/".join(keys)
        if keys[-1] == suffix and contains in joined:
            out.append((joined, leaf))
    return sorted(out, key=lambda kv: _natural_key(kv[0]))


def load_torch_weights(path: str, template: Optional[Any] = None) -> Any:
    """Convert a torchvision/pytorch-fid InceptionV3 ``state_dict`` (saved
    with ``torch.save``) into this module's flax variables.

    Both models declare their BasicConv layers in identical call order, so a
    linear walk pairs them: torch ``*.conv.weight`` (OIHW) -> flax ``kernel``
    (HWIO), BN affine -> ``scale``/``bias``, BN running stats ->
    ``batch_stats``. Every assignment is shape-checked; a mismatch raises
    with both shapes named.
    """
    import torch

    # Plain state_dicts load under the safe weights_only path; only fall
    # back to full unpickling for files storing a whole nn.Module
    # (arbitrary-code risk — keep it last resort, ideally sha256-pinned).
    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    # Drop aux-classifier weights if present (pytorch-fid keeps them).
    sd = {k: v for k, v in sd.items() if not k.startswith("AuxLogits")}

    if template is None:
        module = InceptionV3()
        template = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    template = jax.device_get(template)

    def torch_seq(endswith: str):
        return [
            (k, sd[k].numpy()) for k in sd if k.endswith(endswith)
        ]  # dict order == module definition order == call order

    pairs = [
        ("kernel", "Conv_", "conv.weight", lambda w: w.transpose(2, 3, 1, 0)),
        ("scale", "BatchNorm_", "bn.weight", lambda w: w),
        ("bias", "BatchNorm_", "bn.bias", lambda w: w),
        ("mean", "BatchNorm_", "bn.running_mean", lambda w: w),
        ("var", "BatchNorm_", "bn.running_var", lambda w: w),
    ]

    import numpy as _np

    flat: dict = {}
    for flax_suffix, contains, torch_suffix, convert in pairs:
        ours = _ordered_paths(template, flax_suffix, contains)
        theirs = torch_seq(torch_suffix)
        if len(ours) != len(theirs):
            raise ValueError(
                f"layer count mismatch for {flax_suffix}: "
                f"{len(ours)} flax vs {len(theirs)} torch"
            )
        for (fpath, fleaf), (tkey, tval) in zip(ours, theirs):
            val = convert(tval)
            if tuple(val.shape) != tuple(_np.shape(fleaf)):
                raise ValueError(
                    f"shape mismatch {tkey} {val.shape} -> {fpath} "
                    f"{_np.shape(fleaf)}"
                )
            flat[fpath] = val

    # Final fc head (optional in pytorch-fid dumps).
    if "fc.weight" in sd:
        fc_w = sd["fc.weight"].numpy().T
        fc_b = sd["fc.bias"].numpy()
    else:
        fc_w = fc_b = None

    def rebuild(tree, prefix=""):
        if not isinstance(tree, dict):
            raise TypeError(type(tree))
        out = {}
        for k, v in tree.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                out[k] = rebuild(v, p)
            elif p in flat:
                out[k] = jnp.asarray(flat[p])
            elif k == "kernel" and fc_w is not None and p.endswith("Dense_0/kernel"):
                out[k] = jnp.asarray(fc_w)
            elif k == "bias" and fc_b is not None and p.endswith("Dense_0/bias"):
                out[k] = jnp.asarray(fc_b)
            else:
                out[k] = jnp.asarray(v)
        return out

    return rebuild(template)
