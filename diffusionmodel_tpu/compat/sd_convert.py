"""Stable-Diffusion v1 checkpoint -> flax latent-diffusion trees.

Equivalent of the reference's ``util.load_model`` (reference/
stable_diffusion/util.py:28-103), which builds the SD-v1 architecture and
loads ``sd-v1-4.ckpt`` non-strict. This converter maps the standard SD v1
state-dict names (``model.diffusion_model.*`` for the U-Net,
``first_stage_model.*`` for the VAE) onto this package's
``models.latent_diffusion`` parameter trees. The CLIP text encoder loads
through transformers (``CLIPTextEmbedder``), not from the ckpt.

Weights cannot be downloaded in this zero-egress environment, so the
mapping is validated structurally: a fabricated SD-layout state dict built
from a tiny model's shapes converts into trees that the flax modules accept
and run (tests/test_sd_convert.py).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def _lin(w):
    return np.transpose(w, (1, 0))


class _M:
    """State-dict walker. With ``record=True`` no arrays are touched; the
    (flax_path, torch_key, kind) rules are collected instead — used by the
    structural round-trip test to fabricate SD-layout dicts from flax trees."""

    def __init__(self, sd: Dict[str, np.ndarray], prefix: str,
                 record: bool = False):
        self.sd = sd
        self.prefix = prefix
        self.params: Dict = {}
        self.missing = []
        self.record = record
        self.rules = []  # (fpath, tkey, kind)

    def _set(self, path, value):
        node = self.params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def _get(self, key):
        full = self.prefix + key
        if full not in self.sd:
            self.missing.append(full)
            return None
        return self.sd[full]

    def conv(self, fpath, tkey):
        if self.record:
            self.rules.append((fpath, tkey, "conv"))
            return
        w = self._get(f"{tkey}.weight")
        if w is None:
            return
        self._set(fpath + ("kernel",), _conv(w))
        b = self._get(f"{tkey}.bias")
        if b is not None:
            self._set(fpath + ("bias",), b)

    def dense(self, fpath, tkey, bias=True):
        if self.record:
            self.rules.append((fpath, tkey, "dense" if bias else "dense_nobias"))
            return
        w = self._get(f"{tkey}.weight")
        if w is None:
            return
        self._set(fpath + ("kernel",), _lin(w))
        if bias:
            b = self._get(f"{tkey}.bias")
            if b is not None:
                self._set(fpath + ("bias",), b)

    def norm(self, fpath, tkey):
        if self.record:
            self.rules.append((fpath, tkey, "norm"))
            return
        w = self._get(f"{tkey}.weight")
        if w is None:
            return
        self._set(fpath + ("scale",), w)
        self._set(fpath + ("bias",), self._get(f"{tkey}.bias"))


def convert_sd_unet(sd: Dict[str, np.ndarray],
                    channel_multipliers=(1, 2, 4, 4),
                    attention_levels=(0, 1, 2), n_res_blocks: int = 2,
                    prefix: str = "model.diffusion_model.",
                    _record: bool = False):
    """SD v1 U-Net weights -> UNetModel params. Returns (params, missing)
    — or the (flax_path, torch_key, kind) rule list when _record."""
    m = _M(sd, prefix, record=_record)

    def resblock(fpath, tkey):
        m.norm(fpath + ("in_norm",), f"{tkey}.in_layers.0")
        m.conv(fpath + ("in_conv",), f"{tkey}.in_layers.2")
        m.dense(fpath + ("emb",), f"{tkey}.emb_layers.1")
        m.norm(fpath + ("out_norm",), f"{tkey}.out_layers.0")
        m.conv(fpath + ("out_conv",), f"{tkey}.out_layers.3")
        if m.record or f"{prefix}{tkey}.skip_connection.weight" in sd:
            m.conv(fpath + ("skip",), f"{tkey}.skip_connection")

    def transformer(fpath, tkey):
        m.norm(fpath + ("norm",), f"{tkey}.norm")
        m.conv(fpath + ("proj_in",), f"{tkey}.proj_in")
        bt = f"{tkey}.transformer_blocks.0"
        bf = fpath + ("block_0",)
        for attn in ("attn1", "attn2"):
            for qkv in ("to_q", "to_k", "to_v"):
                m.dense(bf + (attn, qkv), f"{bt}.{attn}.{qkv}", bias=False)
            m.dense(bf + (attn, "to_out"), f"{bt}.{attn}.to_out.0")
        for i in (1, 2, 3):
            m.norm(bf + (f"norm{i}",), f"{bt}.norm{i}")
        m.dense(bf + ("geglu", "proj"), f"{bt}.ff.net.0.proj")
        m.dense(bf + ("ff_out",), f"{bt}.ff.net.2")
        m.conv(fpath + ("proj_out",), f"{tkey}.proj_out")

    m.dense(("time_0",), "time_embed.0")
    m.dense(("time_2",), "time_embed.2")
    m.conv(("in_conv",), "input_blocks.0.0")

    n_levels = len(channel_multipliers)
    idx = 1
    for i in range(n_levels):
        for j in range(n_res_blocks):
            resblock((f"down_{i}_{j}_res",), f"input_blocks.{idx}.0")
            if i in attention_levels:
                transformer((f"down_{i}_{j}_attn",), f"input_blocks.{idx}.1")
            idx += 1
        if i != n_levels - 1:
            m.conv((f"down_{i}_downsample",), f"input_blocks.{idx}.0.op")
            idx += 1

    resblock(("mid_res1",), "middle_block.0")
    transformer(("mid_attn",), "middle_block.1")
    resblock(("mid_res2",), "middle_block.2")

    idx = 0
    for i in reversed(range(n_levels)):
        for j in range(n_res_blocks + 1):
            resblock((f"up_{i}_{j}_res",), f"output_blocks.{idx}.0")
            if i in attention_levels:
                transformer((f"up_{i}_{j}_attn",), f"output_blocks.{idx}.1")
            if i != 0 and j == n_res_blocks:
                # upsample module appended to the level's last output block
                sub = 2 if i in attention_levels else 1
                m.conv((f"up_{i}_upsample",),
                       f"output_blocks.{idx}.{sub}.conv")
            idx += 1

    m.norm(("out_norm",), "out.0")
    m.conv(("out_conv",), "out.2")
    if _record:
        return m.rules
    return m.params, m.missing


def convert_sd_autoencoder(sd: Dict[str, np.ndarray],
                           ch_mults=(1, 2, 4, 4), n_resnet: int = 2,
                           prefix: str = "first_stage_model.",
                           _record: bool = False):
    """SD v1 VAE weights -> Autoencoder params. Returns (params, missing)."""
    m = _M(sd, prefix, record=_record)

    def resnet(fpath, tkey):
        # our ResnetBlock: GroupNorm_0/conv1/GroupNorm_1/conv2/nin_shortcut
        m.norm(fpath + ("GroupNorm_0",), f"{tkey}.norm1")
        m.conv(fpath + ("conv1",), f"{tkey}.conv1")
        m.norm(fpath + ("GroupNorm_1",), f"{tkey}.norm2")
        m.conv(fpath + ("conv2",), f"{tkey}.conv2")
        if m.record or f"{prefix}{tkey}.nin_shortcut.weight" in sd:
            m.conv(fpath + ("nin_shortcut",), f"{tkey}.nin_shortcut")

    def attn(fpath, tkey):
        m.norm(fpath + ("norm",), f"{tkey}.norm")
        for n in ("q", "k", "v", "proj_out"):
            m.conv(fpath + (n,), f"{tkey}.{n}")

    n_levels = len(ch_mults)
    # encoder
    m.conv(("encoder", "conv_in"), "encoder.conv_in")
    for i in range(n_levels):
        for j in range(n_resnet):
            resnet(("encoder", f"down_{i}_block_{j}"),
                   f"encoder.down.{i}.block.{j}")
        if i != n_levels - 1:
            m.conv(("encoder", f"down_{i}_downsample"),
                   f"encoder.down.{i}.downsample.conv")
    resnet(("encoder", "mid_block_1"), "encoder.mid.block_1")
    attn(("encoder", "mid_attn"), "encoder.mid.attn_1")
    resnet(("encoder", "mid_block_2"), "encoder.mid.block_2")
    m.norm(("encoder", "norm_out"), "encoder.norm_out")
    m.conv(("encoder", "conv_out"), "encoder.conv_out")
    # decoder
    m.conv(("decoder", "conv_in"), "decoder.conv_in")
    resnet(("decoder", "mid_block_1"), "decoder.mid.block_1")
    attn(("decoder", "mid_attn"), "decoder.mid.attn_1")
    resnet(("decoder", "mid_block_2"), "decoder.mid.block_2")
    for i in range(n_levels):
        for j in range(n_resnet + 1):
            resnet(("decoder", f"up_{i}_block_{j}"),
                   f"decoder.up.{i}.block.{j}")
        if i != 0:
            m.conv(("decoder", f"up_{i}_upsample"),
                   f"decoder.up.{i}.upsample.conv")
    m.norm(("decoder", "norm_out"), "decoder.norm_out")
    m.conv(("decoder", "conv_out"), "decoder.conv_out")
    m.conv(("quant_conv",), "quant_conv")
    m.conv(("post_quant_conv",), "post_quant_conv")
    if _record:
        return m.rules
    return m.params, m.missing


def expected_sd_keys(rules, prefix: str):
    """The full torch key set a rule list implies (weight + bias per rule,
    weight only for bias-free denses) — used to report EXTRA checkpoint
    keys. Real SD ckpts legitimately carry keys this loader never reads
    (``cond_stage_model.*`` CLIP weights — conditioning loads through
    transformers here; ``model_ema.*``; scalar schedule buffers): those
    are counted, not errors, mirroring the reference's non-strict load
    (reference/stable_diffusion/util.py:97-99)."""
    keys = set()
    for _, tkey, kind in rules:
        keys.add(f"{prefix}{tkey}.weight")
        if kind != "dense_nobias":
            keys.add(f"{prefix}{tkey}.bias")
    return keys


def fabricate_sd_state_dict(flax_tree, rules, prefix: str,
                            dtype=np.float32, rng=None):
    """flax param tree (arrays OR jax.ShapeDtypeStruct leaves, e.g. from
    ``jax.eval_shape``) + recorded rules -> torch-layout state dict.

    With array leaves the real values are transposed back into torch
    layout (the tests' structural round-trip); with shape structs random
    values of the right shape are generated (``rng`` or a fixed default)
    — how benchmarks/make_fake_sd_ckpt.py fabricates a FULL-SIZE 859M
    SD-v1 checkpoint to exercise the loader end-to-end in this
    zero-egress image (VERDICT r3 #5)."""
    rng = rng or np.random.default_rng(0)

    def get(tree, path):
        node = tree
        for p in path:
            if not isinstance(node, dict) or p not in node:
                return None
            node = node[p]
        return node

    def realize(leaf, scale=0.02):
        if hasattr(leaf, "shape") and not hasattr(leaf, "__array__"):
            # ShapeDtypeStruct: generate small random values
            return (rng.standard_normal(leaf.shape) * scale).astype(dtype)
        return np.asarray(leaf, dtype)

    sd = {}
    for fpath, tkey, kind in rules:
        if kind == "norm":
            scale = get(flax_tree, fpath + ("scale",))
            if scale is None:
                continue
            sd[f"{prefix}{tkey}.weight"] = realize(scale)
            sd[f"{prefix}{tkey}.bias"] = realize(
                get(flax_tree, fpath + ("bias",)))
            continue
        leaf = get(flax_tree, fpath + ("kernel",))
        if leaf is None:
            continue  # optional module absent in this config
        k = realize(leaf)
        if kind == "conv":
            sd[f"{prefix}{tkey}.weight"] = np.transpose(k, (3, 2, 0, 1))
        else:  # dense / dense_nobias
            sd[f"{prefix}{tkey}.weight"] = np.transpose(k, (1, 0))
        bias = get(flax_tree, fpath + ("bias",))
        if bias is not None and kind != "dense_nobias":
            sd[f"{prefix}{tkey}.bias"] = realize(bias)
    return sd


def merge_params(init_tree, loaded_tree):
    """Overlay ``loaded_tree``'s leaves onto a full ``init_tree`` — the
    non-strict load semantics of the reference (util.py:97-99: missing
    keys keep their initialized values). Returns a new tree with the
    init tree's structure."""
    if not isinstance(init_tree, dict):
        return loaded_tree if loaded_tree is not None else init_tree
    out = {}
    for k, v in init_tree.items():
        sub = loaded_tree.get(k) if isinstance(loaded_tree, dict) else None
        out[k] = merge_params(v, sub)
    return out


def load_sd_checkpoint(path: str, ae_mults=(1, 2, 4, 4),
                       ae_n_resnet: int = 2, dtype=np.float32, **unet_kw):
    """torch sd-v1-*.ckpt -> (unet_params, vae_params, missing_keys,
    extra_keys).

    ``unet_kw`` forwards to :func:`convert_sd_unet`
    (channel_multipliers / attention_levels / n_res_blocks) and
    ``ae_mults``/``ae_n_resnet`` to :func:`convert_sd_autoencoder`, so
    non-SD-v1 architectures (e.g. the CLI's tiny smoke arch) load from
    matching-layout checkpoints too. Weights are cast to ``dtype``
    (fp16-stored checkpoints become fp32 params by default, matching
    flax init). ``extra_keys`` lists checkpoint keys the mapping never
    reads (CLIP/cond_stage, EMA copies, schedule buffers in real SD
    ckpts) — informational, mirroring the reference's non-strict load."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw)
    sd = {k: v.detach().cpu().numpy().astype(dtype)
          for k, v in sd.items() if hasattr(v, "detach")}
    unet, miss_u = convert_sd_unet(sd, **unet_kw)
    vae, miss_v = convert_sd_autoencoder(sd, ch_mults=ae_mults,
                                         n_resnet=ae_n_resnet)
    expected = expected_sd_keys(
        convert_sd_unet({}, _record=True, **unet_kw),
        unet_kw.get("prefix", "model.diffusion_model."))
    expected |= expected_sd_keys(
        convert_sd_autoencoder({}, ch_mults=ae_mults, n_resnet=ae_n_resnet,
                               _record=True),
        "first_stage_model.")
    extra = sorted(set(sd) - expected)
    return unet, vae, miss_u + miss_v, extra
