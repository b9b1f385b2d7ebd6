"""SD-v1 checkpoint converter: structural round-trip on tiny configs.

No SD weights exist in this zero-egress image, so the mapping is validated
by bijectivity: fabricate an SD-layout state dict FROM a tiny flax model's
init tree (reversing the layout transforms, using the converter's own
recorded rule list for the names), convert it back, and require exact tree
equality plus a working forward pass. This catches missing/extra/misnamed
rules against the real module structure.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionmodel_tpu.compat.sd_convert import (
    convert_sd_autoencoder,
    convert_sd_unet,
)
from diffusionmodel_tpu.models.latent_diffusion import Autoencoder, UNetModel


def _get(tree, path):
    node = tree
    for p in path:
        if p not in node:
            return None
        node = node[p]
    return node


def _fabricate(flax_params, rules, prefix):
    """flax tree + (fpath, tkey, kind) rules -> torch-layout state dict."""
    sd = {}
    for fpath, tkey, kind in rules:
        leaf = _get(flax_params, fpath + ("kernel",)) if kind != "norm" else None
        if kind == "norm":
            scale = _get(flax_params, fpath + ("scale",))
            if scale is None:
                continue
            sd[f"{prefix}{tkey}.weight"] = np.asarray(scale)
            sd[f"{prefix}{tkey}.bias"] = np.asarray(
                _get(flax_params, fpath + ("bias",)))
            continue
        if leaf is None:
            continue  # optional module absent in this config (skip/shortcut)
        k = np.asarray(leaf)
        if kind == "conv":
            sd[f"{prefix}{tkey}.weight"] = np.transpose(k, (3, 2, 0, 1))
        else:  # dense
            sd[f"{prefix}{tkey}.weight"] = np.transpose(k, (1, 0))
        bias = _get(flax_params, fpath + ("bias",))
        if bias is not None and kind != "dense_nobias":
            sd[f"{prefix}{tkey}.bias"] = np.asarray(bias)
    return sd


def _assert_tree_equal(a, b, path=()):
    assert set(a) == set(b), f"at {path}: {set(a) ^ set(b)}"
    for k in a:
        if isinstance(a[k], dict):
            _assert_tree_equal(a[k], b[k], path + (k,))
        else:
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                       err_msg=str(path + (k,)))


def test_sd_unet_roundtrip():
    m = UNetModel(in_channels=4, out_channels=4, channels=32, n_res_blocks=2,
                  attention_levels=(1,), channel_multipliers=(1, 2),
                  n_heads=4, d_cond=16)
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    cond = jnp.zeros((1, 7, 16))
    variables = m.init(jax.random.PRNGKey(0), x, t, cond)
    rules = convert_sd_unet(
        {}, channel_multipliers=(1, 2), attention_levels=(1,),
        n_res_blocks=2, _record=True)
    sd = _fabricate(variables["params"], rules, "model.diffusion_model.")
    params, missing = convert_sd_unet(
        sd, channel_multipliers=(1, 2), attention_levels=(1,), n_res_blocks=2)
    # only optional skip connections may be missing
    assert all("skip_connection" in k for k in missing), missing
    _assert_tree_equal(variables["params"], params)
    out = m.apply({"params": params}, x, t, cond)
    assert out.shape == x.shape


def test_sd_autoencoder_roundtrip():
    ae = Autoencoder(channels=16, ch_mults=(1, 2), z_channels=4,
                     emb_channels=4)
    img = jnp.zeros((1, 32, 32, 3))
    variables = ae.init(jax.random.PRNGKey(1), img, jax.random.PRNGKey(2))
    rules = convert_sd_autoencoder({}, ch_mults=(1, 2), n_resnet=2,
                                   _record=True)
    sd = _fabricate(variables["params"], rules, "first_stage_model.")
    params, missing = convert_sd_autoencoder(sd, ch_mults=(1, 2), n_resnet=2)
    assert all("nin_shortcut" in k for k in missing), missing
    _assert_tree_equal(variables["params"], params)
    out, dist = ae.apply({"params": params}, img, jax.random.PRNGKey(3))
    assert out.shape == img.shape
