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

    def raw_conv(self, tkey: str, fpath: str, bias: bool = True):
        """nn.Conv directly at <fpath> (no Conv2d wrapper)."""
        w = self.take(f"{tkey}.weight").transpose(2, 3, 1, 0)
        self._set(self.params, f"{fpath}/kernel", w)
        if bias:
            self._set(self.params, f"{fpath}/bias", self.take(f"{tkey}.bias"))

    def linear(self, tkey: str, fpath: str, bias: bool = True):
        """torch nn.Linear (out, in) -> flax Dense kernel (in, out)."""
        self._set(self.params, f"{fpath}/kernel", self.take(f"{tkey}.weight").T)
        if bias:
            self._set(self.params, f"{fpath}/bias", self.take(f"{tkey}.bias"))

    def ln(self, tkey: str, fpath: str):
        """torch nn.LayerNorm -> flax LayerNorm (scale/bias)."""
        self._set(self.params, f"{fpath}/scale", self.take(f"{tkey}.weight"))
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
    # the mask head lives outside the scan in our build (applied once to the
    # final GRU state — numerically identical, see flow/raft.py)
    t.conv(f"{ub_t}.mask.0", f"{fprefix}/mask_head/mask_0")
    t.conv(f"{ub_t}.mask.2", f"{fprefix}/mask_head/mask_2")


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


# -------------------------------------------------------------- FlowFormer
def _twins_svt(t: _Tree, tkey: str, fpath: str, depths=(2, 2)):
    """timm/vendored twins_svt_large truncated to 2 stages
    (`encoders.py:7-21`, param layout `LatentCostFormer/twins.py:1151-1240`)."""
    for i in range(len(depths)):
        t.raw_conv(f"{tkey}.patch_embeds.{i}.proj", f"{fpath}/patch_embeds_{i}/proj")
        t.ln(f"{tkey}.patch_embeds.{i}.norm", f"{fpath}/patch_embeds_{i}/norm")
        for j in range(depths[i]):
            b_t = f"{tkey}.blocks.{i}.{j}"
            b_f = f"{fpath}/blocks_{i}_{j}"
            t.ln(f"{b_t}.norm1", f"{b_f}/norm1")
            t.ln(f"{b_t}.norm2", f"{b_f}/norm2")
            if j % 2 == 0:  # LSA (`twins.py:1213`: even blocks get ws=7)
                t.linear(f"{b_t}.attn.qkv", f"{b_f}/attn/qkv")
            else:  # GSA with sr conv
                t.linear(f"{b_t}.attn.q", f"{b_f}/attn/q")
                t.linear(f"{b_t}.attn.kv", f"{b_f}/attn/kv")
                t.raw_conv(f"{b_t}.attn.sr", f"{b_f}/attn/sr")
                t.ln(f"{b_t}.attn.norm", f"{b_f}/attn/norm")
            t.linear(f"{b_t}.attn.proj", f"{b_f}/attn/proj")
            t.linear(f"{b_t}.mlp.fc1", f"{b_f}/mlp/fc1")
            t.linear(f"{b_t}.mlp.fc2", f"{b_f}/mlp/fc2")
        t.raw_conv(f"{tkey}.pos_block.{i}.proj.0", f"{fpath}/pos_block_{i}/proj_0")
    # final stage norm survives truncation but is unused (`encoders.py:19-20`)
    for suffix in ("norm.weight", "norm.bias"):
        if f"{tkey}.{suffix}" in t.sd:
            t.used.add(f"{tkey}.{suffix}")


def _attn_ffn(t: _Tree, tkey: str, fpath: str):
    """q/k/v/proj + norms + ffn of the perceiver attention layers
    (`encoder.py:214-346`)."""
    t.ln(f"{tkey}.norm1", f"{fpath}/norm1")
    t.ln(f"{tkey}.norm2", f"{fpath}/norm2")
    for name in ("q", "k", "v", "proj"):
        t.linear(f"{tkey}.{name}", f"{fpath}/{name}")
    t.linear(f"{tkey}.ffn.0", f"{fpath}/ffn/fc0")
    t.linear(f"{tkey}.ffn.3", f"{fpath}/ffn/fc3")


def _vertical_block(t: _Tree, tkey: str, fpath: str, is_global: bool):
    """Twins Block with RPE+context attention (`twins.py:331-546`)."""
    t.ln(f"{tkey}.norm1", f"{fpath}/norm1")
    t.ln(f"{tkey}.norm2", f"{fpath}/norm2")
    for name in ("context_proj", "q", "k", "v", "proj"):
        t.linear(f"{tkey}.attn.{name}", f"{fpath}/attn/{name}")
    if is_global:
        t.raw_conv(f"{tkey}.attn.sr_key", f"{fpath}/attn/sr_key")
        t.raw_conv(f"{tkey}.attn.sr_value", f"{fpath}/attn/sr_value")
        t.ln(f"{tkey}.attn.norm", f"{fpath}/attn/norm")
    t.linear(f"{tkey}.mlp.fc1", f"{fpath}/mlp_fc1")
    t.linear(f"{tkey}.mlp.fc2", f"{fpath}/mlp_fc2")


def _cost_perceiver(t: _Tree, tkey: str, fpath: str, depth: int = 3):
    pe_t, pe_f = f"{tkey}.patch_embed", f"{fpath}/patch_embed"
    for i in (0, 2, 4):
        t.raw_conv(f"{pe_t}.proj.{i}", f"{pe_f}/proj_{i}")
    for i in (0, 2):
        t.raw_conv(f"{pe_t}.ffn_with_coord.{i}", f"{pe_f}/ffn_{i}")
    t.ln(f"{pe_t}.norm", f"{pe_f}/norm")

    t.param(f"{tkey}.latent_tokens", f"{fpath}/latent_tokens")
    _attn_ffn(t, f"{tkey}.input_layer", f"{fpath}/input_layer")
    for i in range(depth):
        _attn_ffn(t, f"{tkey}.encoder_layers.{i}", f"{fpath}/encoder_layers_{i}")
        v_t = f"{tkey}.vertical_encoder_layers.{i}"
        v_f = f"{fpath}/vertical_encoder_layers_{i}"
        _vertical_block(t, f"{v_t}.local_block", f"{v_f}/local_block", False)
        _vertical_block(t, f"{v_t}.global_block", f"{v_f}/global_block", True)


def _memory_decoder(t: _Tree, tkey: str, fpath: str):
    t.conv(f"{tkey}.proj", f"{fpath}/proj")
    t.raw_conv(f"{tkey}.att.to_qk", f"{fpath}/att/to_qk", bias=False)
    # frozen randomly-initialized RelPosEmb is unused in the forward
    # (`gma.py:62-71` commented out); skip but mark consumed
    for name in ("rel_height", "rel_width"):
        if f"{tkey}.att.pos_emb.{name}.weight" in t.sd:
            t.used.add(f"{tkey}.att.pos_emb.{name}.weight")

    cross_t = f"{tkey}.decoder_layer.cross_attend"
    # loop-invariant k/v live on the decoder itself (computed pre-scan)
    t.linear(f"{cross_t}.k", f"{fpath}/cross_k")
    t.linear(f"{cross_t}.v", f"{fpath}/cross_v")
    step = f"{fpath}/step"
    t.ln(f"{cross_t}.norm1", f"{step}/cross/norm1")
    t.ln(f"{cross_t}.norm2", f"{step}/cross/norm2")
    t.linear(f"{cross_t}.q", f"{step}/cross/q")
    t.linear(f"{cross_t}.proj", f"{step}/cross/proj")
    t.linear(f"{cross_t}.ffn.0", f"{step}/cross/ffn/fc0")
    t.linear(f"{cross_t}.ffn.3", f"{step}/cross/ffn/fc3")

    t.conv(f"{tkey}.flow_token_encoder.0", f"{step}/flow_token_encoder_0")
    t.conv(f"{tkey}.flow_token_encoder.2", f"{step}/flow_token_encoder_2")

    ub_t, ub_f = f"{tkey}.update_block", f"{step}/update_block"
    for name in ("convc1", "convc2", "convf1", "convf2", "conv"):
        t.conv(f"{ub_t}.encoder.{name}", f"{ub_f}/encoder/{name}")
    for name in ("convz1", "convr1", "convq1", "convz2", "convr2", "convq2"):
        t.conv(f"{ub_t}.gru.{name}", f"{ub_f}/gru/{name}")
    t.conv(f"{ub_t}.flow_head.conv1", f"{ub_f}/flow_head_conv1")
    t.conv(f"{ub_t}.flow_head.conv2", f"{ub_f}/flow_head_conv2")
    # the mask head lives outside the 32-iter scan in our build (applied once
    # to the final hidden state — numerically identical, flow/flowformer.py)
    t.conv(f"{ub_t}.mask.0", f"{fpath}/mask_head/mask_0")
    t.conv(f"{ub_t}.mask.2", f"{fpath}/mask_head/mask_2")
    t.raw_conv(f"{ub_t}.aggregator.to_v", f"{ub_f}/aggregator/to_v", bias=False)
    t.param(f"{ub_t}.aggregator.gamma", f"{ub_f}/aggregator/gamma")


def _flowformer(t: _Tree, tprefix: str, fprefix: str):
    _twins_svt(t, f"{tprefix}context_encoder.svt", f"{fprefix}/context_encoder")
    me_t, me_f = f"{tprefix}memory_encoder", f"{fprefix}/memory_encoder"
    _twins_svt(t, f"{me_t}.feat_encoder.svt", f"{me_f}/feat_encoder")
    t.raw_conv(f"{me_t}.channel_convertor", f"{me_f}/channel_convertor", bias=False)
    _cost_perceiver(t, f"{me_t}.cost_perceiver_encoder", f"{me_f}/cost_perceiver_encoder")
    _memory_decoder(t, f"{tprefix}memory_decoder", f"{fprefix}/memory_decoder")


def convert_flowformer(sd: Mapping[str, Any]) -> tuple[dict, dict]:
    """flowformer_sintel.pth state dict -> FlowFormer module tree."""
    t = _Tree(sd)
    _flowformer(t, "", "")
    params = t.params.pop("", t.params)
    stats = t.stats.pop("", t.stats)
    return params, stats


def convert_gimmvfi_f(sd: Mapping[str, Any]) -> tuple[dict, dict]:
    """gimmvfi_f_arb[_lpips].pt state dict -> GIMMVFI_F module tree
    (`gimmvfi_f.py:28-138`: no cproj/fproj — otherwise the R layout)."""
    t = _Tree(sd)
    _flowformer(t, "flow_estimator.", "flow_estimator")

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


# ------------------------------------------------------------------- LPIPS
def convert_lpips(sd: Mapping[str, Any]) -> tuple[dict, dict]:
    """Reference LPIPS state dict -> train/lpips.LPIPS module tree.

    Accepts the full vendored-LPIPS layout (`lpips.py:39-123`): alexnet
    slices `net.sliceN.i.*` + linear heads `linK.model.1.weight` (the
    reference ships the heads as `alex.pth`; the alexnet backbone comes from
    a torchvision state dict merged under the same keys)."""
    t = _Tree(sd)
    for slice_idx, conv_idx in ((1, 0), (2, 3), (3, 6), (4, 8), (5, 10)):
        t.conv(f"net.slice{slice_idx}.{conv_idx}", f"net/conv{conv_idx}")
    for k in range(5):
        w = t.take(f"lin{k}.model.1.weight").transpose(2, 3, 1, 0)
        t._set(t.params, f"lin{k}/kernel", w)
    # ScalingLayer buffers are baked constants (`lpips.py:192-203`)
    for name in ("scaling_layer.shift", "scaling_layer.scale"):
        if name in t.sd:
            t.used.add(name)
    return t.params, t.stats


def convert_alexnet_features(sd: Mapping[str, Any]) -> dict:
    """torchvision `alexnet` state dict (`features.N.*`) -> AlexNetFeatures
    params (for assembling LPIPS from the two released artifacts)."""
    t = _Tree(sd)
    for conv_idx in (0, 3, 6, 8, 10):
        t.conv(f"features.{conv_idx}", f"conv{conv_idx}")
    return t.params


def unused_keys(sd: Mapping[str, Any], tree: _Tree) -> list[str]:
    return sorted(set(sd.keys()) - tree.used)
