"""PyTorch checkpoint -> flax params converter (parity harness).

Maps the reference's state_dict layouts (SURVEY 2.8: full training dict
{model_state_dict, ...}, early-stop dict, bare state_dict) onto this
package's flax parameter pytrees, so reference-trained weights can be
sampled/evaluated here and activation-parity tests can compare the two
implementations on identical weights.

Weight layout transforms:
- Conv2d [O,I,kh,kw] -> flax Conv kernel [kh,kw,I,O]
- Linear [O,I] -> flax Dense kernel [I,O]
- ConvTranspose2d [I,O,kh,kw] -> flax ConvTranspose kernel [kh,kw,I,O]
- BatchNorm weight/bias -> scale/bias; running stats -> batch_stats
- GroupNorm weight/bias -> scale/bias

The name mapping is rule-based over this package's module paths (which
deliberately mirror the reference's attribute names: init_conv, down1..4,
ca1..4, up0..4, local_enhance, out).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """torch.load -> {'model_state_dict': {name: np.ndarray}, ...extras}."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        sd = ckpt["model_state_dict"]
        extras = {k: v for k, v in ckpt.items() if k != "model_state_dict"
                  and not hasattr(v, "numpy")}
    else:
        sd = ckpt
        extras = {}
    sd_np = {k: v.detach().cpu().numpy() for k, v in sd.items()
             if hasattr(v, "detach")}
    return {"model_state_dict": sd_np, **extras}


def _strip_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Drop the DDPM wrapper prefix and schedule buffers."""
    out = {}
    buffers = {"alpha_t", "oneover_sqrta", "sqrt_beta_t", "alphabar_t",
               "sqrtab", "sqrtmab", "mab_over_sqrtmab"}
    for k, v in sd.items():
        if k in buffers:
            continue
        out[k[len("nn_model."):] if k.startswith("nn_model.") else k] = v
    return out


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def _convT(w):
    # flax ConvTranspose (lax.conv_transpose) applies the kernel without the
    # spatial flip torch's gradient-of-conv formulation implies — flip here
    # (verified numerically in tests/test_parity_torch.py).
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def _lin(w):
    return np.transpose(w, (1, 0))


class _Mapper:
    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = sd
        self.params: Dict[str, Any] = {}
        self.batch_stats: Dict[str, Any] = {}

    def _set(self, tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def conv(self, fpath, tkey, transposed=False):
        w = self.sd[f"{tkey}.weight"]
        self._set(self.params, fpath + ("kernel",),
                  _convT(w) if transposed else _conv(w))
        if f"{tkey}.bias" in self.sd:
            self._set(self.params, fpath + ("bias",), self.sd[f"{tkey}.bias"])

    def dense(self, fpath, tkey):
        self._set(self.params, fpath + ("kernel",), _lin(self.sd[f"{tkey}.weight"]))
        if f"{tkey}.bias" in self.sd:
            self._set(self.params, fpath + ("bias",), self.sd[f"{tkey}.bias"])

    def bn(self, fpath, tkey):
        self._set(self.params, fpath + ("scale",), self.sd[f"{tkey}.weight"])
        self._set(self.params, fpath + ("bias",), self.sd[f"{tkey}.bias"])
        self._set(self.batch_stats, fpath + ("mean",),
                  self.sd[f"{tkey}.running_mean"])
        self._set(self.batch_stats, fpath + ("var",),
                  self.sd[f"{tkey}.running_var"])

    def gn(self, fpath, tkey):
        self._set(self.params, fpath + ("scale",), self.sd[f"{tkey}.weight"])
        self._set(self.params, fpath + ("bias",), self.sd[f"{tkey}.bias"])

    def scalar(self, fpath, tkey):
        self._set(self.params, fpath, self.sd[tkey])

    # ---- composite blocks ----

    def norm(self, fpath, tkey, kind):
        """Our Norm wrapper holds BatchNorm_0/GroupNorm_0 inside."""
        if kind == "batch":
            self.bn(fpath + ("BatchNorm_0",), tkey)
        else:
            self.gn(fpath + ("GroupNorm_0",), tkey)

    def resconv(self, fpath, tkey, kind, has_se):
        self.conv(fpath + ("Conv_0",), f"{tkey}.conv1.0")
        self.norm(fpath + ("Norm_0",), f"{tkey}.conv1.1", kind)
        self.conv(fpath + ("Conv_1",), f"{tkey}.conv2.0")
        self.norm(fpath + ("Norm_1",), f"{tkey}.conv2.1", kind)
        if has_se and f"{tkey}.se.fc.0.weight" in self.sd:
            self.dense(fpath + ("SEBlock_0", "Dense_0"), f"{tkey}.se.fc.0")
            self.dense(fpath + ("SEBlock_0", "Dense_1"), f"{tkey}.se.fc.2")

    def embed_fc(self, fpath, tkey):
        self.dense(fpath + ("Dense_0",), f"{tkey}.model.0")
        self.dense(fpath + ("Dense_1",), f"{tkey}.model.2")

    def unet_down_v2(self, fpath, tkey, kind, compress="channel_compress",
                     adjust="ch_adjust"):
        self.conv(fpath + ("Conv_0",), f"{tkey}.{compress}.0")
        self.norm(fpath + ("Norm_0",), f"{tkey}.{compress}.1", kind)
        self.conv(fpath + ("Conv_1",), f"{tkey}.{adjust}")
        self.conv(fpath + ("Conv_2",), f"{tkey}.down.0")
        self.norm(fpath + ("Norm_1",), f"{tkey}.down.1", kind)
        self.resconv(fpath + ("ResConvBlock_0",), f"{tkey}.down.3", kind, True)
        self.conv(fpath + ("Conv_3",), f"{tkey}.down.4")

    def unet_up_v2(self, fpath, tkey, kind):
        self.conv(fpath + ("Conv_0",), f"{tkey}.model.0.1")
        self.resconv(fpath + ("ResConvBlock_0",), f"{tkey}.model.1", kind, False)
        self.resconv(fpath + ("ResConvBlock_1",), f"{tkey}.model.2", kind, False)

    def coord_attn(self, fpath, tkey, kind):
        self.conv(fpath + ("conv1_h",), f"{tkey}.conv1_h")
        self.conv(fpath + ("conv1_w",), f"{tkey}.conv1_w")
        self.norm(fpath + ("bn1_h",), f"{tkey}.bn1_h", kind)
        self.norm(fpath + ("bn1_w",), f"{tkey}.bn1_w", kind)
        self.conv(fpath + ("h2w_proj",), f"{tkey}.h2w_proj")
        self.conv(fpath + ("w2h_proj",), f"{tkey}.w2h_proj")
        self.conv(fpath + ("conv_h",), f"{tkey}.conv_h")
        self.conv(fpath + ("conv_w",), f"{tkey}.conv_w")
        for s in ("gamma_h", "gamma_w", "alpha", "beta"):
            self.scalar(fpath + (s,), f"{tkey}.{s}")

    def local_enhancer(self, fpath, tkey):
        self.conv(fpath + ("Conv_0",), f"{tkey}.conv.0")
        self.gn(fpath + ("GroupNorm_0",), f"{tkey}.conv.1")
        self.conv(fpath + ("Conv_1",), f"{tkey}.conv.3")


def convert_context_unet_v2(state_dict: Dict[str, np.ndarray],
                            norm: str = "batch"
                            ) -> Tuple[Dict, Dict]:
    """Reference ContextUnet (new_scripy.py:270-356) weights -> flax trees.

    ``norm`` must match the ModelConfig used here ("batch" reproduces the
    reference exactly; converting into a GroupNorm model is shape-invalid).
    """
    sd = _strip_prefix(state_dict)
    m = _Mapper(sd)
    m.resconv(("init_conv",), "init_conv", norm, True)
    for i in range(1, 5):
        m.unet_down_v2((f"down{i}",), f"down{i}", norm)
        m.coord_attn((f"ca{i}",), f"ca{i}", norm)
    m.embed_fc(("time_emb1",), "time_emb1")
    m.embed_fc(("time_emb2",), "time_emb2")
    m.embed_fc(("ctx_emb1",), "ctx_emb1")
    m.embed_fc(("ctx_emb2",), "ctx_emb2")
    m.conv(("up0_convt",), "up0.0", transposed=True)
    m.gn(("up0_gn",), "up0.1")
    m.unet_up_v2(("up1",), "up1", norm)
    m.unet_up_v2(("up2",), "up2", norm)
    m.unet_up_v2(("up3",), "up3", norm)
    m.unet_up_v2(("up4",), "up4", norm)
    if "local_enhance.conv.0.weight" in sd:
        m.local_enhancer(("local_enhance",), "local_enhance")
    m.conv(("out_conv1",), "out.0")
    m.gn(("out_gn",), "out.1")
    m.conv(("out_conv2",), "out.3")
    return m.params, m.batch_stats


def convert_context_unet_v1(state_dict: Dict[str, np.ndarray],
                            norm: str = "batch") -> Tuple[Dict, Dict]:
    """scripy_old.py v1 ContextUnet (scripy_old.py:241-324) weights -> flax.
    Same architecture as v2 minus LocalEnhancer, with different torch
    attribute names (channel_compressor/channel_adjust, timeembed*/
    contextembed*)."""
    sd = _strip_prefix(state_dict)
    m = _Mapper(sd)
    m.resconv(("init_conv",), "init_conv", norm, True)
    for i in range(1, 5):
        m.unet_down_v2((f"down{i}",), f"down{i}", norm,
                       compress="channel_compressor", adjust="channel_adjust")
        m.coord_attn((f"ca{i}",), f"ca{i}", norm)
    m.embed_fc(("time_emb1",), "timeembed1")
    m.embed_fc(("time_emb2",), "timeembed2")
    m.embed_fc(("ctx_emb1",), "contextembed1")
    m.embed_fc(("ctx_emb2",), "contextembed2")
    m.conv(("up0_convt",), "up0.0", transposed=True)
    m.gn(("up0_gn",), "up0.1")
    for i in range(1, 5):
        m.unet_up_v2((f"up{i}",), f"up{i}", norm)
    m.conv(("out_conv1",), "out.0")
    m.gn(("out_gn",), "out.1")
    m.conv(("out_conv2",), "out.3")
    return m.params, m.batch_stats


def convert_cbam_unet(state_dict: Dict[str, np.ndarray], norm: str = "batch"
                      ) -> Tuple[Dict, Dict]:
    """custom_dataset.py v1.5 CBAM ContextUnet (custom_dataset.py:168-252)
    weights -> flax (CbamContextUnet)."""
    sd = _strip_prefix(state_dict)
    m = _Mapper(sd)
    m.resconv(("init_conv",), "init_conv", norm, False)
    for i in range(1, 5):
        # _Down: ResConv + conv4x4s2 + GN + GELU (model.0 / model.1 / model.2)
        m.resconv((f"down{i}", "ResConvBlock_0"), f"down{i}.model.0", norm,
                  False)
        m.conv((f"down{i}", "Conv_0"), f"down{i}.model.1")
        m.gn((f"down{i}", "GroupNorm_0"), f"down{i}.model.2")
        # CBAM
        m.conv((f"cbam{i}", "channel_attention", "mlp1"),
               f"cbam{i}.channel_attention.shared_MLP.0")
        m.conv((f"cbam{i}", "channel_attention", "mlp2"),
               f"cbam{i}.channel_attention.shared_MLP.2")
        m.conv((f"cbam{i}", "spatial_attention", "conv7"),
               f"cbam{i}.spatial_attention.conv2d")
    for ours, theirs in (("contextembed1", "contextembed1"),
                         ("contextembed2", "contextembed2"),
                         ("timeembed1", "timeembed1"),
                         ("timeembed2", "timeembed2")):
        m.embed_fc((ours,), theirs)
    m.conv(("up0_convt",), "up0.0", transposed=True)
    m.gn(("up0_gn",), "up0.1")
    for i in range(1, 5):
        m.conv((f"up{i}", "ConvTranspose_0"), f"up{i}.model.0",
               transposed=True)
        m.resconv((f"up{i}", "ResConvBlock_0"), f"up{i}.model.1", norm, False)
        m.resconv((f"up{i}", "ResConvBlock_1"), f"up{i}.model.2", norm, False)
    m.local_enhancer(("local_enhance",), "local_enhance")
    m.conv(("out_conv1",), "out.0")
    m.gn(("out_gn",), "out.1")
    m.conv(("out_conv2",), "out.3")
    return m.params, m.batch_stats


def convert_mnist_unet(state_dict: Dict[str, np.ndarray], norm: str = "batch"
                       ) -> Tuple[Dict, Dict]:
    """MNIST ContextUnet (MNIST_script.py:119-187) weights -> flax trees."""
    sd = _strip_prefix(state_dict)
    m = _Mapper(sd)
    m.resconv(("init_conv",), "init_conv", norm, False)
    m.resconv(("down1_res",), "down1.model.0", norm, False)
    m.resconv(("down2_res",), "down2.model.0", norm, False)
    for name in ("timeembed1", "timeembed2", "contextembed1", "contextembed2"):
        m.embed_fc((name,), name)
    m.conv(("up0_convt",), "up0.0", transposed=True)
    m.gn(("up0_gn",), "up0.1")
    for i in (1, 2):
        m.conv((f"up{i}_convt",), f"up{i}.model.0", transposed=True)
        m.resconv((f"up{i}_res1",), f"up{i}.model.1", norm, False)
        m.resconv((f"up{i}_res2",), f"up{i}.model.2", norm, False)
    m.conv(("out_conv1",), "out.0")
    m.gn(("out_gn",), "out.1")
    m.conv(("out_conv2",), "out.3")
    return m.params, m.batch_stats


def convert_state_dict(state_dict: Dict[str, np.ndarray], arch: str,
                       norm: str = "batch") -> Tuple[Dict, Dict]:
    if arch == "context_unet_v2":
        return convert_context_unet_v2(state_dict, norm)
    if arch == "context_unet_v1":
        return convert_context_unet_v1(state_dict, norm)
    if arch == "cbam_unet":
        return convert_cbam_unet(state_dict, norm)
    if arch == "mnist_unet":
        return convert_mnist_unet(state_dict, norm)
    raise ValueError(f"no converter for arch {arch!r}")
