"""PyTorch checkpoint -> flax parameter-tree conversion.

Maps the reference's released checkpoints (raft-things.pth, gimm.pt,
gimmvfi_r_arb[_lpips].pt — SURVEY.md §2.9) onto gimmvfi_tpu module trees.
Works on raw state_dicts (key -> numpy array); no torch import needed if the
caller already has numpy arrays.

Key layout sources: `raft/raft.py` + `raft/extractor.py` + `raft/update.py`
for the flow estimator, `gimmvfi_r.py:34-111` for the VFI model,
`modules/fi_components.py` for the AMT decoders, `modules/hyponet.py:171-186`
for the INR parameter dict.

Returns `(params, batch_stats)` nested dicts ready for
`model.apply({"params": params, "batch_stats": batch_stats}, ...)`.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v
    # torch tensor without importing torch at module scope
    return v.detach().cpu().numpy()


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a .pth/.pt file into a numpy state dict.

    Handles the reference's checkpoint wrappers: raw state dicts,
    {"state_dict": ...} training checkpoints, and DDP "module." prefixes
    (`raft/__init__.py:16-20`, `main.py:106-120`).
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if k.startswith("module."):
            k = k[len("module.") :]
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
    return out


class _Tree:
    """Accumulates params/batch_stats nested dicts by dotted flax paths."""

    def __init__(self, sd: Mapping[str, np.ndarray]):
        self.sd = sd
        self.params: dict = {}
        self.stats: dict = {}
        self.used: set[str] = set()

    def _set(self, root: dict, path: str, value: np.ndarray):
        parts = path.split("/")
        for p in parts[:-1]:
            root = root.setdefault(p, {})
        root[parts[-1]] = np.asarray(value)

    def take(self, key: str) -> np.ndarray:
        self.used.add(key)
        return _np(self.sd[key])

    # ---- leaf converters
    def conv(self, tkey: str, fpath: str, bias: bool = True):
        """torch Conv2d OIHW -> flax HWIO under <fpath>/conv."""
        w = self.take(f"{tkey}.weight").transpose(2, 3, 1, 0)
        self._set(self.params, f"{fpath}/conv/kernel", w)
        if bias:
            self._set(self.params, f"{fpath}/conv/bias", self.take(f"{tkey}.bias"))

    def raw_conv(self, tkey: str, fpath: str):
        """nn.Conv directly at <fpath> (no Conv2d wrapper)."""
        w = self.take(f"{tkey}.weight").transpose(2, 3, 1, 0)
        self._set(self.params, f"{fpath}/kernel", w)
        self._set(self.params, f"{fpath}/bias", self.take(f"{tkey}.bias"))

    def prelu(self, tkey: str, fpath: str):
        self._set(self.params, f"{fpath}/alpha", self.take(f"{tkey}.weight"))

    def bn(self, tkey: str, fpath: str):
        self._set(self.params, f"{fpath}/scale", self.take(f"{tkey}.weight"))
        self._set(self.params, f"{fpath}/bias", self.take(f"{tkey}.bias"))
        self._set(self.stats, f"{fpath}/mean", self.take(f"{tkey}.running_mean"))
        self._set(self.stats, f"{fpath}/var", self.take(f"{tkey}.running_var"))
        self.used.add(f"{tkey}.num_batches_tracked")

    def param(self, tkey: str, fpath: str):
        self._set(self.params, fpath, self.take(tkey))

    # ---- composite converters
    def conv_prelu(self, tkey: str, fpath: str):
        """convrelu Sequential(Conv, PReLU) -> ConvPReLU."""
        self.conv(f"{tkey}.0", f"{fpath}/conv")
        self.prelu(f"{tkey}.1", f"{fpath}/prelu")

    def lateral(self, tkey: str, fpath: str):
        self.conv(f"{tkey}.layers.0", f"{fpath}/conv_0")
        self.conv(f"{tkey}.layers.2", f"{fpath}/conv_2")

    def res_block(self, tkey: str, fpath: str):
        for i in (1, 2, 3, 4):
            self.conv_prelu(f"{tkey}.conv{i}", f"{fpath}/conv{i}")
        self.conv(f"{tkey}.conv5", f"{fpath}/conv5")
        self.prelu(f"{tkey}.prelu", f"{fpath}/prelu")


# --------------------------------------------------------------------- RAFT
def _residual_block(t: _Tree, tkey: str, fpath: str, batch_norm: bool):
    t.conv(f"{tkey}.conv1", f"{fpath}/conv1")
    t.conv(f"{tkey}.conv2", f"{fpath}/conv2")
    if batch_norm:
        t.bn(f"{tkey}.norm1", f"{fpath}/norm1")
        t.bn(f"{tkey}.norm2", f"{fpath}/norm2")
    if f"{tkey}.downsample.0.weight" in t.sd:
        t.conv(f"{tkey}.downsample.0", f"{fpath}/downsample")
        if batch_norm:
            t.bn(f"{tkey}.downsample.1", f"{fpath}/norm3")


def _basic_encoder(t: _Tree, tkey: str, fpath: str, batch_norm: bool):
    t.conv(f"{tkey}.conv1", f"{fpath}/conv1")
    if batch_norm:
        t.bn(f"{tkey}.norm1", f"{fpath}/norm1")
    for li, planes in ((1, 64), (2, 96), (3, 128)):
        for bi in (0, 1):
            _residual_block(
                t, f"{tkey}.layer{li}.{bi}", f"{fpath}/layer{li}_{bi}", batch_norm
            )
    t.conv(f"{tkey}.conv2", f"{fpath}/conv2")


def _raft(t: _Tree, tprefix: str, fprefix: str):
    _basic_encoder(t, f"{tprefix}fnet", f"{fprefix}/fnet", batch_norm=False)
    _basic_encoder(t, f"{tprefix}cnet", f"{fprefix}/cnet", batch_norm=True)

    ub_t = f"{tprefix}update_block"
    ub_f = f"{fprefix}/refine/update_block"
    enc = f"{ub_t}.encoder"
    for name in ("convc1", "convc2", "convf1", "convf2", "conv"):
        t.conv(f"{enc}.{name}", f"{ub_f}/encoder/{name}")
    for name in ("convz1", "convr1", "convq1", "convz2", "convr2", "convq2"):
        t.conv(f"{ub_t}.gru.{name}", f"{ub_f}/gru/{name}")
    t.conv(f"{ub_t}.flow_head.conv1", f"{ub_f}/flow_head/conv1")
    t.conv(f"{ub_t}.flow_head.conv2", f"{ub_f}/flow_head/conv2")
    t.conv(f"{ub_t}.mask.0", f"{ub_f}/mask_0")
    t.conv(f"{ub_t}.mask.2", f"{ub_f}/mask_2")


def convert_raft(sd: Mapping[str, Any], tprefix: str = "") -> tuple[dict, dict]:
    """raft-things.pth (keys fnet./cnet./update_block.) -> RAFT module tree."""
    t = _Tree(sd)
    _raft(t, tprefix, "")
    # flax nests under no prefix: lift the "" level
    params = t.params.pop("", t.params)
    stats = t.stats.pop("", t.stats)
    return params, stats


# ------------------------------------------------------------------- shared
def _motion_encoder(t: _Tree, tkey: str, fpath: str):
    t.conv(f"{tkey}.0", f"{fpath}/conv0")
    t.conv(f"{tkey}.1", f"{fpath}/conv1")
    for i in (3, 4, 5):
        t.lateral(f"{tkey}.{i}", f"{fpath}/lateral{i}")
    t.conv(f"{tkey}.7", f"{fpath}/conv7")


def _latent_refiner(t: _Tree, tkey: str, fpath: str):
    t.conv(f"{tkey}.0", f"{fpath}/conv0")
    t.conv(f"{tkey}.1", f"{fpath}/conv1")
    t.lateral(f"{tkey}.3", f"{fpath}/lateral3")
    t.conv(f"{tkey}.5", f"{fpath}/conv5")


def _hyponet(t: _Tree, tkey: str, fpath: str, n_layer: int = 5):
    for i in range(n_layer):
        t.param(f"{tkey}.params_dict.linear_wb{i}", f"{fpath}/linear_wb{i}")


def _gimm_common(t: _Tree):
    _motion_encoder(t, "cnn_encoder", "cnn_encoder")
    _latent_refiner(t, "res_conv", "res_conv")
    _hyponet(t, "hyponet", "hyponet")
    t.param("alpha_v", "alpha_v")
    t.param("alpha_fe", "alpha_fe")
    t.used.add("g_filter")  # fixed gaussian, baked into gaussian_blur3x3


# ------------------------------------------------------------------ GIMM-VFI
def _upsample_head(t: _Tree, tkey: str, fpath: str, first_cr: int):
    for i in range(5):
        t.conv_prelu(f"{tkey}.{first_cr + i}", f"{fpath}/cr{i}")
    t.conv(f"{tkey}.{first_cr + 5}", f"{fpath}/proj")
    t.bn(f"{tkey}.{first_cr + 6}", f"{fpath}/bn")


def _decoder_convblock(t: _Tree, tkey: str, fpath: str):
    t.conv_prelu(f"{tkey}.0", f"{fpath}/cb0")
    for i in (1, 2, 3):
        t.res_block(f"{tkey}.{i}", f"{fpath}/cb{i}")
    t.conv(f"{tkey}.4", f"{fpath}/cb4")


def _update_block(t: _Tree, tkey: str, fpath: str):
    for name in ("convc1", "convc2", "convf1", "convf2", "conv"):
        t.conv(f"{tkey}.{name}", f"{fpath}/{name}")
    for seq in ("gru", "feat_head", "flow_head"):
        t.conv(f"{tkey}.{seq}.0", f"{fpath}/{seq}_0")
        t.conv(f"{tkey}.{seq}.2", f"{fpath}/{seq}_2")


def convert_gimmvfi_r(sd: Mapping[str, Any]) -> tuple[dict, dict]:
    """gimmvfi_r_arb[_lpips].pt state dict -> GIMMVFI_R module tree."""
    t = _Tree(sd)
    _raft(t, "flow_estimator.", "flow_estimator")
    for name in ("amt_last_cproj", "amt_second_last_cproj", "amt_fproj"):
        t.conv(name, name)

    _upsample_head(t, "amt_init_decoder.upsample", "amt_init_decoder/upsample", 1)
    _decoder_convblock(t, "amt_init_decoder.convblock", "amt_init_decoder")
    _upsample_head(t, "amt_final_decoder.upsample", "amt_final_decoder/upsample", 2)
    _decoder_convblock(t, "amt_final_decoder.convblock", "amt_final_decoder")
    _update_block(t, "amt_update4_low", "amt_update4_low")
    _update_block(t, "amt_update4_high", "amt_update4_high")

    t.conv("amt_comb_block.0", "amt_comb_block/conv_0")
    t.prelu("amt_comb_block.1", "amt_comb_block/prelu")
    t.conv("amt_comb_block.2", "amt_comb_block/conv_2")

    _gimm_common(t)
    return t.params, t.stats


def convert_gimm(sd: Mapping[str, Any]) -> tuple[dict, dict]:
    """gimm.pt state dict -> GIMM (stage-1) module tree."""
    t = _Tree(sd)
    _gimm_common(t)
    return t.params, t.stats


def unused_keys(sd: Mapping[str, Any], tree: _Tree) -> list[str]:
    return sorted(set(sd.keys()) - tree.used)
