"""Import the reference PyTorch implementation on CPU for golden tests.

The reference (read-only at /root/reference) depends on packages absent from
this image (timm, omegaconf, yacs, cupy, easydict). For parity testing we
only need its *torch module definitions* with random weights, so install
minimal stubs before importing. Tests that use this helper skip cleanly when
the reference tree is unavailable.

This file contains no reference code — only import shims and a CPU torch
reimplementation of the softsplat kernel's semantics for goldens.
"""

from __future__ import annotations

import sys
import types

REF_ROOT = "/root/reference"


def _mod(name: str) -> types.ModuleType:
    m = sys.modules.get(name)
    if m is None:
        m = types.ModuleType(name)
        sys.modules[name] = m
    return m


def install_stubs():
    import torch
    import torch.nn as nn

    # ---- omegaconf
    om = _mod("omegaconf")

    class OmegaConf:
        @staticmethod
        def to_object(x):
            return list(x) if isinstance(x, (list, tuple)) else x

        @staticmethod
        def structured(x):
            return x

        @staticmethod
        def merge(a, b):
            return b

    om.OmegaConf = OmegaConf
    om.MISSING = "???"

    # ---- cupy (softsplat imports it; CPU path never calls it)
    cp = _mod("cupy")
    cp.memoize = lambda **kw: (lambda f: f)

    class _FakeNdarray:  # einops probes cupy.ndarray for backend detection
        pass

    cp.ndarray = _FakeNdarray

    # ---- timm (flowformer vendored Twins imports pieces at module scope)
    timm = _mod("timm")
    timm_data = _mod("timm.data")
    timm_data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    timm_data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
    timm_models = _mod("timm.models")
    layers = _mod("timm.models.layers")

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a, b)
        return tensor

    class DropPath(nn.Identity):
        def __init__(self, *a, **kw):
            super().__init__()

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features=None, out_features=None,
                     act_layer=nn.GELU, drop=0.0):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = nn.Linear(hidden_features, out_features)
            self.drop = nn.Dropout(drop)

        def forward(self, x):
            return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))

    layers.Mlp = Mlp
    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    layers.activations = types.SimpleNamespace()
    timm_models.layers = layers

    registry = _mod("timm.models.registry")
    registry.register_model = lambda f: f
    vit = _mod("timm.models.vision_transformer")
    vit.Attention = nn.Identity
    helpers = _mod("timm.models.helpers")
    helpers.build_model_with_cfg = lambda *a, **kw: None
    helpers.overlay_external_default_cfg = lambda *a, **kw: None

    def create_model(name, pretrained=False, **kw):
        # Build the reference's own vendored Twins (param-layout identical to
        # timm twins_svt_large) with random weights — no downloads available.
        assert name == "twins_svt_large", name
        from functools import partial

        import src.models.generalizable_INR.flowformer.core.FlowFormer.LatentCostFormer.twins as vt  # noqa: E501
        from src.models.generalizable_INR.flowformer.core.FlowFormer.LatentCostFormer.twins import (  # noqa: E501
            Twins,
        )

        # The vendored Block passes `context` positionally, but the vendored
        # *plain* attention classes (the timm-equivalent ones the Twins class
        # instantiates) don't take it — the real reference runs timm's Twins.
        # Shim the signature; numerics are untouched.
        if not getattr(vt, "_ctx_shimmed", False):
            for cls in (vt.LocallyGroupedAttn, vt.GlobalSubSampleAttn):
                orig = cls.forward
                cls.forward = (
                    lambda self, x, size, context=None, _orig=orig: _orig(
                        self, x, size
                    )
                )
            vt._ctx_shimmed = True

        return Twins(
            patch_size=4,
            embed_dims=[128, 256, 512, 1024],
            num_heads=[4, 8, 16, 32],
            mlp_ratios=[4, 4, 4, 4],
            depths=[2, 2, 18, 2],
            wss=[7, 7, 7, 7],
            sr_ratios=[8, 4, 2, 1],
            norm_layer=partial(nn.LayerNorm, eps=1e-6),
        )

    timm.create_model = create_model
    timm.data = timm_data
    timm.models = timm_models

    # ---- loguru (flowformer modules import it unused)
    loguru = _mod("loguru")
    loguru.logger = types.SimpleNamespace(
        info=lambda *a, **k: None, warning=lambda *a, **k: None
    )

    # ---- torchvision (LPIPS backbone; absent from this image). Only the
    # `.features` structure matters — weights are random for goldens.
    tv = _mod("torchvision")
    tv_models = _mod("torchvision.models")

    def tv_alexnet(pretrained=False, **kw):
        features = nn.Sequential(
            nn.Conv2d(3, 64, kernel_size=11, stride=4, padding=2),
            nn.ReLU(inplace=True),
            nn.MaxPool2d(kernel_size=3, stride=2),
            nn.Conv2d(64, 192, kernel_size=5, padding=2),
            nn.ReLU(inplace=True),
            nn.MaxPool2d(kernel_size=3, stride=2),
            nn.Conv2d(192, 384, kernel_size=3, padding=1),
            nn.ReLU(inplace=True),
            nn.Conv2d(384, 256, kernel_size=3, padding=1),
            nn.ReLU(inplace=True),
            nn.Conv2d(256, 256, kernel_size=3, padding=1),
            nn.ReLU(inplace=True),
            nn.MaxPool2d(kernel_size=3, stride=2),
        )
        return types.SimpleNamespace(features=features)

    tv_models.alexnet = tv_alexnet
    tv.models = tv_models

    # ---- yacs
    yacs = _mod("yacs")
    yacs_config = _mod("yacs.config")

    class CfgNode(dict):
        def __init__(self, *a, **kw):
            super().__init__()

        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

        def clone(self):
            import copy

            return copy.deepcopy(self)

    yacs_config.CfgNode = CfgNode
    yacs.config = yacs_config

    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)

    # Bypass package __init__ chains (they pull in gimmvfi_f -> timm twins and
    # the omegaconf dataclass configs, which break on py3.12): register the
    # parent packages as namespace-style modules so leaf imports work.
    for name, path in [
        ("src", f"{REF_ROOT}/src"),
        ("src.models", f"{REF_ROOT}/src/models"),
        (
            "src.models.generalizable_INR",
            f"{REF_ROOT}/src/models/generalizable_INR",
        ),
    ]:
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [path]
            sys.modules[name] = pkg

    # `from ..configs import ...` inside the reference resolves to this stub
    # (py3.12 rejects the reference's mutable dataclass defaults).
    cfgmod = _mod("src.models.generalizable_INR.configs")
    cfgmod.HypoNetConfig = NS
    cfgmod.GIMMConfig = NS
    cfgmod.GIMMVFIConfig = NS


class NS:
    """Attribute namespace with .copy() — stands in for OmegaConf nodes."""

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def copy(self):
        return NS(**self.__dict__)

    def __contains__(self, k):
        return k in self.__dict__


def gimmvfi_config():
    """Reference arch config (configs/gimmvfi/gimmvfi_r_arb.yaml)."""
    return NS(
        type="gimmvfi_r",
        ema=False,
        fwarp_type="linear",
        rec_weight=0.1,
        raft_iter=20,
        coord_range=[-1.0, 1.0],
        modulated_layer_idxs=[1],
        hyponet=NS(
            type="mlp",
            n_layer=5,
            hidden_dim=[128],
            use_bias=True,
            input_dim=3,
            output_dim=2,
            output_bias=0.5,
            normalize_weight=True,
            linear_interpo=False,
            activation=NS(type="siren", siren_w0=1.0),
            initialization=NS(weight_init_type="siren", bias_init_type="siren"),
        ),
    )


def torch_softsplat_cpu(ten_in, ten_flow):
    """CPU torch equivalent of the softsplat_out CUDA kernel (goldens only)."""
    import torch

    n, c, h, w = ten_in.shape
    device = ten_in.device
    jj = torch.arange(w, dtype=torch.float32, device=device).view(1, 1, w)
    ii = torch.arange(h, dtype=torch.float32, device=device).view(1, h, 1)
    x = jj + ten_flow[:, 0]
    y = ii + ten_flow[:, 1]
    finite = torch.isfinite(x) & torch.isfinite(y)
    x = torch.where(finite, x, torch.full_like(x, -10.0))
    y = torch.where(finite, y, torch.full_like(y, -10.0))

    x0 = torch.floor(x).long()
    y0 = torch.floor(y).long()
    wx1 = x - x0.float()
    wy1 = y - y0.float()

    out = torch.zeros_like(ten_in)
    flat = out.view(n, c, h * w)
    vals = ten_in.view(n, c, h * w)
    for xi, yi, wgt in [
        (x0, y0, (1 - wx1) * (1 - wy1)),
        (x0 + 1, y0, wx1 * (1 - wy1)),
        (x0, y0 + 1, (1 - wx1) * wy1),
        (x0 + 1, y0 + 1, wx1 * wy1),
    ]:
        ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = (yi.clamp(0, h - 1) * w + xi.clamp(0, w - 1)).view(n, 1, h * w)
        upd = vals * (wgt * ok.float()).view(n, 1, h * w)
        flat.scatter_add_(2, idx.expand(n, c, h * w), upd)
    return out


def patched_softsplat(tenIn, tenFlow, tenMetric, strMode, return_norm=False):
    """Reference `softsplat` wrapper semantics on CPU (softsplat.py:286-352)."""
    import torch

    base = strMode.split("-")[0]
    if base == "avg":
        tenIn = torch.cat(
            [tenIn, tenIn.new_ones(tenIn.shape[0], 1, *tenIn.shape[2:])], 1
        )
    elif base == "linear":
        tenIn = torch.cat([tenIn * tenMetric, tenMetric], 1)
    elif base == "softmax":
        tenIn = torch.cat([tenIn * tenMetric.exp(), tenMetric.exp()], 1)

    out = torch_softsplat_cpu(tenIn, tenFlow)

    if base in ("avg", "linear", "softmax"):
        norm = out[:, -1:]
        parts = strMode.split("-")
        policy = parts[1] if len(parts) > 1 else "addeps"
        if policy == "addeps":
            norm = norm + 1e-7
        elif policy == "zeroeps":
            norm = torch.where(norm == 0.0, torch.ones_like(norm), norm)
        elif policy == "clipeps":
            norm = norm.clamp(1e-7, None)
        if return_norm:
            return out[:, :-1], norm
        out = out[:, :-1] / norm
    return out
