"""Minimal torch LPIPS (VGG16) mirroring the lpips package's state_dict layout.

Test fixture only: lets tests/test_lpips.py validate the Flax LPIPS
architecture and metrics/lpips.py's state_dict converter numerically, without
downloadable weights (the tests/torch_inception_ref.py precedent). Module
names match ``lpips.LPIPS(net='vgg')`` — slices keep the original torchvision
``features`` indices (``net.slice1.0.weight`` ... ``net.slice5.28.weight``)
and heads are ``lin{i}.model.1.weight`` — which is what the converter's
natural-order walk relies on.
"""

from __future__ import annotations

import torch
import torch.nn as nn

# (channels, n_convs) per block — torchvision VGG16 features.
VGG_CFG = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


class Vgg16Slices(nn.Module):
    def __init__(self):
        super().__init__()
        layers = []
        in_c = 3
        for feats, n_convs in VGG_CFG:
            for _ in range(n_convs):
                layers.append(nn.Conv2d(in_c, feats, 3, padding=1))
                layers.append(nn.ReLU(inplace=False))
                in_c = feats
            layers.append(nn.MaxPool2d(2, 2))
        # Slice boundaries after each block's final ReLU (lpips.pn.vgg16):
        # slice1 = [0, 4), slice2 = [4, 9), slice3 = [9, 16),
        # slice4 = [16, 23), slice5 = [23, 30).
        bounds = [(0, 4), (4, 9), (9, 16), (16, 23), (23, 30)]
        for si, (lo, hi) in enumerate(bounds, start=1):
            s = nn.Sequential()
            for idx in range(lo, hi):
                s.add_module(str(idx), layers[idx])
            setattr(self, f"slice{si}", s)

    def forward(self, x):
        outs = []
        for si in range(1, 6):
            x = getattr(self, f"slice{si}")(x)
            outs.append(x)
        return outs


class NetLinLayer(nn.Module):
    def __init__(self, chn_in):
        super().__init__()
        self.model = nn.Sequential(
            nn.Dropout(), nn.Conv2d(chn_in, 1, 1, bias=False)
        )

    def forward(self, x):
        return self.model(x)


class ScalingLayer(nn.Module):
    def __init__(self):
        super().__init__()
        self.register_buffer(
            "shift", torch.tensor([-0.030, -0.088, -0.188])[None, :, None, None]
        )
        self.register_buffer(
            "scale", torch.tensor([0.458, 0.448, 0.450])[None, :, None, None]
        )

    def forward(self, x):
        return (x - self.shift) / self.scale


def _normalize_tensor(x, eps=1e-10):
    norm = torch.sqrt(torch.sum(x**2, dim=1, keepdim=True))
    return x / (norm + eps)


class TorchLPIPS(nn.Module):
    """lpips.LPIPS(net='vgg') forward math with matching state_dict keys."""

    def __init__(self):
        super().__init__()
        self.scaling_layer = ScalingLayer()
        self.net = Vgg16Slices()
        chans = [c for c, _ in VGG_CFG]
        for i, c in enumerate(chans):
            setattr(self, f"lin{i}", NetLinLayer(c))

    @torch.no_grad()
    def forward(self, in0, in1):
        """in0/in1: [b, 3, h, w] in [-1, 1] -> per-example distance [b]."""
        self.eval()
        f0 = self.net(self.scaling_layer(in0))
        f1 = self.net(self.scaling_layer(in1))
        total = 0.0
        for i, (a, b) in enumerate(zip(f0, f1)):
            diff = (_normalize_tensor(a) - _normalize_tensor(b)) ** 2
            lin = getattr(self, f"lin{i}")
            # Non-negative weights, matching the Flax side's relu guard.
            w = lin.model[1].weight.clamp(min=0)
            weighted = (diff * w).sum(dim=1)  # [b, h, w]
            total = total + weighted.mean(dim=(1, 2))
        return total
