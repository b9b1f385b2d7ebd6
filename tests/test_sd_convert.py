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
    expected_sd_keys,
    fabricate_sd_state_dict,
    load_sd_checkpoint,
    merge_params,
)
from diffusionmodel_tpu.models.latent_diffusion import Autoencoder, UNetModel

pytestmark = pytest.mark.slow  # excluded from the quick tier (-m "not slow")

# fabrication now lives in the package (benchmarks/make_fake_sd_ckpt.py
# uses it to build the full-size 859M checkpoint); tests exercise the
# shared implementation.
_fabricate = fabricate_sd_state_dict


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


def test_fabricate_from_shape_structs():
    """fabricate_sd_state_dict accepts jax.eval_shape trees (no arrays) —
    the path benchmarks/make_fake_sd_ckpt.py uses to build the full-size
    859M SD-v1 checkpoint without materializing flax params."""
    m = UNetModel(in_channels=4, out_channels=4, channels=32, n_res_blocks=1,
                  attention_levels=(0,), channel_multipliers=(1, 2),
                  n_heads=2, d_cond=16)
    shapes = jax.eval_shape(
        m.init, jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1,)), jnp.zeros((1, 7, 16)))["params"]
    rules = convert_sd_unet({}, channel_multipliers=(1, 2),
                            attention_levels=(0,), n_res_blocks=1,
                            _record=True)
    sd = fabricate_sd_state_dict(shapes, rules, "model.diffusion_model.",
                                 dtype=np.float16)
    assert all(v.dtype == np.float16 for v in sd.values())
    # converting the fabricated dict back yields arrays of the init shapes
    params, missing = convert_sd_unet(
        sd, channel_multipliers=(1, 2), attention_levels=(0,),
        n_res_blocks=1)
    flat_p = jax.tree_util.tree_leaves_with_path(params)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(shapes))
    assert len(flat_p) > 0
    for path, leaf in flat_p:
        assert flat_s[path].shape == leaf.shape, path
    # values are non-degenerate randoms, not zeros
    assert max(float(np.abs(v).max()) for v in sd.values()) > 1e-3


def test_merge_params_nonstrict():
    init = {"a": {"k": np.zeros(3)}, "b": {"k": np.ones(2)}}
    loaded = {"a": {"k": np.full(3, 7.0)}}
    out = merge_params(init, loaded)
    np.testing.assert_array_equal(out["a"]["k"], 7.0)
    np.testing.assert_array_equal(out["b"]["k"], 1.0)  # kept at init
    assert set(out) == {"a", "b"}
    # keys the init tree doesn't have are dropped (init structure wins)
    out2 = merge_params(init, {"zzz": {"k": np.zeros(1)}, **loaded})
    assert "zzz" not in out2


def test_load_sd_checkpoint_missing_and_extra(tmp_path):
    """End-to-end torch .ckpt file -> load_sd_checkpoint with a dropped
    mapped key (non-strict: reference util.py:97-99) and junk extra keys
    (cond_stage/EMA/buffers in real SD ckpts): missing + extra are
    reported, and the merged tree still runs."""
    import torch

    kw = dict(channel_multipliers=(1, 2), attention_levels=(0,),
              n_res_blocks=1)
    m = UNetModel(in_channels=4, out_channels=4, channels=32, n_heads=2,
                  d_cond=16, use_flash=False, **kw)
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,))
    cond = jnp.zeros((1, 7, 16))
    variables = m.init(jax.random.PRNGKey(0), x, t, cond)
    ae = Autoencoder(channels=16, ch_mults=(1, 2), z_channels=4,
                     emb_channels=4)
    avars = ae.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)),
                    jax.random.PRNGKey(2))

    urules = convert_sd_unet({}, _record=True, **kw)
    arules = convert_sd_autoencoder({}, ch_mults=(1, 2), n_resnet=1,
                                    _record=True)
    sd = fabricate_sd_state_dict(variables["params"], urules,
                                 "model.diffusion_model.")
    sd.update(fabricate_sd_state_dict(avars["params"], arules,
                                      "first_stage_model."))
    dropped = "model.diffusion_model.time_embed.2.weight"
    assert dropped in sd
    del sd[dropped]
    sd["cond_stage_model.transformer.junk.weight"] = np.zeros(4, np.float32)
    sd["model_ema.decay"] = np.asarray(0.9999, np.float32)
    ck = tmp_path / "fake.ckpt"
    torch.save({"state_dict": {k: torch.from_numpy(np.atleast_1d(v))
                               for k, v in sd.items()}}, ck)

    unet_p, vae_p, missing, extra = load_sd_checkpoint(
        str(ck), ae_mults=(1, 2), ae_n_resnet=1, **kw)
    assert dropped in missing
    assert all(("time_embed.2" in k) or ("skip_connection" in k)
               or ("nin_shortcut" in k) for k in missing), missing
    assert "cond_stage_model.transformer.junk.weight" in extra
    assert "model_ema.decay" in extra
    assert all(not k.startswith(("model.diffusion_model.",
                                 "first_stage_model.")) for k in extra), extra

    merged = merge_params(variables["params"], unet_p)
    out = m.apply({"params": merged}, x, t, cond)
    assert out.shape == x.shape and bool(jnp.isfinite(out).all())


def test_expected_sd_keys_cover_fabrication():
    """Every key fabricate_sd_state_dict can emit is in expected_sd_keys
    (so a complete fabricated ckpt reports zero extras)."""
    kw = dict(channel_multipliers=(1, 2), attention_levels=(0,),
              n_res_blocks=1)
    m = UNetModel(in_channels=4, out_channels=4, channels=32, n_heads=2,
                  d_cond=16, **kw)
    variables = jax.eval_shape(
        m.init, jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1,)), jnp.zeros((1, 7, 16)))
    rules = convert_sd_unet({}, _record=True, **kw)
    sd = fabricate_sd_state_dict(variables["params"], rules,
                                 "model.diffusion_model.")
    exp = expected_sd_keys(rules, "model.diffusion_model.")
    assert set(sd) <= exp
