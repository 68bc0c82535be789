"""Minimal timm stand-in so the ACTUAL reference model code imports.

The reference only uses ``trunc_normal_`` and ``DropPath`` from
``timm.models.layers`` (``nets/ShfitScaleFormer.py:9``, ``vit_model.py``).
timm is not installed in this image; these two are standard public
definitions, so a 20-line shim lets us import and run the reference's own
classes as a parity oracle (instead of a re-implementation written by us).
"""

from __future__ import annotations

import sys
import types


def install() -> None:
    if "timm.models.layers" in sys.modules:
        return
    import torch
    import torch.nn as nn

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std)
            tensor.clamp_(min=a * std + mean, max=b * std + mean)
        return tensor

    class DropPath(nn.Module):
        def __init__(self, drop_prob: float = 0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = x.new_empty(shape).bernoulli_(keep)
            return x * mask / keep

    layers = types.ModuleType("timm.models.layers")
    layers.trunc_normal_ = trunc_normal_
    layers.DropPath = DropPath
    models = types.ModuleType("timm.models")
    models.layers = layers
    timm = types.ModuleType("timm")
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


def import_reference(ref_root: str = "/root/reference"):
    """Import the reference's model + loss modules with the shim installed.

    Returns (ShfitScaleFormer module, Losses module) or raises ImportError
    when the reference tree is unavailable (tests then skip).
    """
    import importlib
    import os

    if not os.path.isdir(ref_root):
        raise ImportError(f"reference tree not found at {ref_root}")
    install()
    if ref_root not in sys.path:
        sys.path.insert(0, ref_root)
    ssf = importlib.import_module("nets.ShfitScaleFormer")
    losses = importlib.import_module("Losses")
    return ssf, losses
