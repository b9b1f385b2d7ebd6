"""Activation parity vs the reference PyTorch implementation.

Strategy (SURVEY section 4c): instantiate the reference modules in torch
(CPU), convert their weights through compat.torch_convert, run both
implementations on identical inputs, and compare activations. PRNG streams
can't match across frameworks, so losses are compared with injected
noise/t via closed forms elsewhere; here we pin the deterministic forward
path.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffusionmodel_tpu.compat.torch_convert import (  # noqa: E402
    convert_context_unet_v2,
    convert_mnist_unet,
)
from diffusionmodel_tpu.nn import ContextUnet, MnistContextUnet  # noqa: E402
from tests.reference_loader import load_reference_module  # noqa: E402

pytestmark = pytest.mark.slow  # excluded from the quick tier (-m "not slow")

ATOL = 2e-4  # fp32 conv stacks across frameworks
RTOL = 2e-3


def _np(x):
    return x.detach().cpu().numpy()


@pytest.fixture(scope="module")
def ref():
    mod = load_reference_module("new_scripy")
    if mod is None:
        pytest.skip("reference not mounted")
    return mod


@pytest.fixture(scope="module")
def ref_mnist():
    mod = load_reference_module("MNIST_script")
    if mod is None:
        pytest.skip("reference not mounted")
    return mod


def test_coord_attn_parity(ref):
    torch.manual_seed(0)
    tmod = ref.CoordAttn(32).eval()
    sd = {k: _np(v) for k, v in tmod.state_dict().items()}

    from diffusionmodel_tpu.compat.torch_convert import _Mapper

    m = _Mapper({f"ca.{k}": v for k, v in sd.items()})
    m.coord_attn(("ca",), "ca", "batch")
    params, bs = m.params["ca"], m.batch_stats.get("ca", {})

    x = np.random.RandomState(1).randn(2, 16, 16, 32).astype(np.float32)
    from diffusionmodel_tpu.nn.coord_attn import CoordAttn as JCoordAttn

    jm = JCoordAttn(32, norm="batch")
    variables = {"params": params, "batch_stats": bs}
    got = np.asarray(jm.apply(variables, jnp.asarray(x), train=False))

    with torch.no_grad():
        want = _np(tmod(torch.from_numpy(x).permute(0, 3, 1, 2))
                   ).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_se_block_parity(ref):
    torch.manual_seed(1)
    tmod = ref.SEBlock(64).eval()
    sd = {f"b.{k}": _np(v) for k, v in tmod.state_dict().items()}
    from diffusionmodel_tpu.compat.torch_convert import _Mapper

    m = _Mapper(sd)
    m.dense(("b", "Dense_0"), "b.fc.0")
    m.dense(("b", "Dense_1"), "b.fc.2")
    from diffusionmodel_tpu.nn.blocks import SEBlock as JSE

    x = np.random.RandomState(2).randn(2, 8, 8, 64).astype(np.float32)
    got = np.asarray(JSE(64).apply({"params": m.params["b"]}, jnp.asarray(x)))
    with torch.no_grad():
        want = _np(tmod(torch.from_numpy(x).permute(0, 3, 1, 2))
                   ).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_resconv_block_parity(ref):
    torch.manual_seed(2)
    tmod = ref.ResConvBlock(16, 32, is_res=True).eval()
    sd = {f"r.{k}": _np(v) for k, v in tmod.state_dict().items()}
    from diffusionmodel_tpu.compat.torch_convert import _Mapper

    m = _Mapper(sd)
    m.resconv(("r",), "r", "batch", True)
    from diffusionmodel_tpu.nn.blocks import ResConvBlock as JRes

    jm = JRes(16, 32, is_res=True, norm="batch")
    x = np.random.RandomState(3).randn(2, 8, 8, 16).astype(np.float32)
    variables = {"params": m.params["r"], "batch_stats": m.batch_stats["r"]}
    got = np.asarray(jm.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        want = _np(tmod(torch.from_numpy(x).permute(0, 3, 1, 2))
                   ).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_unet_down_up_parity(ref):
    torch.manual_seed(3)
    tdown = ref.UnetDown(16, 32).eval()
    sd = {f"d.{k}": _np(v) for k, v in tdown.state_dict().items()}
    from diffusionmodel_tpu.compat.torch_convert import _Mapper

    m = _Mapper(sd)
    m.unet_down_v2(("d",), "d", "batch")
    from diffusionmodel_tpu.nn.blocks import UnetDown as JDown

    jm = JDown(16, 32, norm="batch")
    x = np.random.RandomState(4).randn(1, 16, 16, 16).astype(np.float32)
    variables = {"params": m.params["d"], "batch_stats": m.batch_stats["d"]}
    got = np.asarray(jm.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        want = _np(tdown(torch.from_numpy(x).permute(0, 3, 1, 2))
                   ).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    tup = ref.UnetUp(64, 16).eval()
    sd = {f"u.{k}": _np(v) for k, v in tup.state_dict().items()}
    m = _Mapper(sd)
    m.unet_up_v2(("u",), "u", "batch")
    from diffusionmodel_tpu.nn.blocks import UnetUp as JUp

    jup = JUp(64, 16, norm="batch")
    xa = np.random.RandomState(5).randn(1, 8, 8, 32).astype(np.float32)
    skip = np.random.RandomState(6).randn(1, 8, 8, 32).astype(np.float32)
    variables = {"params": m.params["u"], "batch_stats": m.batch_stats["u"]}
    got = np.asarray(jup.apply(variables, jnp.asarray(xa), jnp.asarray(skip),
                               train=False))
    with torch.no_grad():
        want = _np(tup(torch.from_numpy(xa).permute(0, 3, 1, 2),
                       torch.from_numpy(skip).permute(0, 3, 1, 2))
                   ).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_full_context_unet_parity(ref):
    """Full v2 forward at 128px, n_classes=1 (the only class count where the
    reference's LocalEnhancer ctx-mask wiring broadcasts without crashing,
    SURVEY Q3 — and with mask values in {0,1} the (mask>1.2) gate is all
    zeros, matching our mask=None identity path)."""
    torch.manual_seed(4)
    tmod = ref.ContextUnet(in_ch=3, n_feat=16, n_classes=1).eval()
    # The literal LocalEnhancer wiring cannot broadcast for any batch>1
    # (Q3, verified: [B,C,H,W] * [B,1,n_classes]); with {0,1}-valued ctx
    # masks its gate is all-zero anyway, so the *intended* result is the
    # identity — patch it so the reference forward can run at all.
    tmod.local_enhance.forward = lambda x, mask: x
    sd = {k: _np(v) for k, v in tmod.state_dict().items()}
    params, bs = convert_context_unet_v2(sd, norm="batch")

    jm = ContextUnet(in_ch=3, n_feat=16, n_classes=1, img_size=128,
                     norm="batch")
    rng = np.random.RandomState(7)
    x = rng.randn(2, 128, 128, 3).astype(np.float32)
    c = np.zeros((2,), np.int64)
    t = np.array([0.3, 0.7], np.float32)
    ctx = np.ones((2,), np.float32)

    got = np.asarray(jm.apply(
        {"params": params, "batch_stats": bs}, jnp.asarray(x),
        jnp.asarray(c.astype(np.int32)), jnp.asarray(t), jnp.asarray(ctx),
        attn_mask=None, train=False))
    with torch.no_grad():
        want = _np(tmod(
            torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(c),
            torch.from_numpy(t), torch.from_numpy(ctx),
        )).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


def test_full_mnist_unet_parity(ref_mnist):
    torch.manual_seed(5)
    tmod = ref_mnist.ContextUnet(in_channels=1, n_feat=16, n_classes=10).eval()
    sd = {k: _np(v) for k, v in tmod.state_dict().items()}
    params, bs = convert_mnist_unet(sd, norm="batch")

    jm = MnistContextUnet(in_ch=1, n_feat=16, n_classes=10, img_size=28,
                          norm="batch", mnist_style_ctx_flip=True)
    rng = np.random.RandomState(8)
    x = rng.randn(4, 28, 28, 1).astype(np.float32)
    c = np.array([0, 3, 7, 9], np.int64)
    t = np.full((4,), 0.5, np.float32)
    ctx = np.array([0.0, 1.0, 0.0, 1.0], np.float32)

    got = np.asarray(jm.apply(
        {"params": params, "batch_stats": bs}, jnp.asarray(x),
        jnp.asarray(c.astype(np.int32)), jnp.asarray(t), jnp.asarray(ctx),
        attn_mask=None, train=False))
    with torch.no_grad():
        want = _np(tmod(
            torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(c),
            torch.from_numpy(t), torch.from_numpy(ctx),
        )).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


def test_schedule_parity_vs_reference_impl(ref):
    """ddpm_schedules ulp-level comparison against the reference's own
    function. Ours is the correctly-rounded fp32 value (float64 math, one
    rounding); the remaining gap IS torch's own fp32 error:

    - direct per-element buffers (alpha, 1/sqrt(alpha), sqrt(beta)) match to
      <= 2 ulp;
    - cumulative buffers (alphabar and its derived sqrt terms) carry torch's
      fp32 log/cumsum/exp accumulation error (~1e-7 vs float64 truth), which
      sqrt(1-ab) amplifies near ab~1 — a few e-6 absolute, NOT a formula
      difference (verified against float64 during round 2).
    """
    from diffusionmodel_tpu.schedules import ddpm_schedules

    want = ref.ddpm_schedules(1e-4, 0.02, 700)
    got = ddpm_schedules(1e-4, 0.02, 700)
    for k in ("alpha_t", "oneover_sqrta", "sqrt_beta_t"):
        np.testing.assert_array_max_ulp(
            np.asarray(got[k]), want[k].numpy(), maxulp=2)
    for k in ("alphabar_t", "sqrtab"):
        np.testing.assert_array_max_ulp(
            np.asarray(got[k]), want[k].numpy(), maxulp=32)
    for k in ("sqrtmab", "mab_over_sqrtmab"):
        np.testing.assert_allclose(np.asarray(got[k]), want[k].numpy(),
                                   rtol=1e-5, atol=4e-6, err_msg=k)


def test_full_v1_context_unet_parity():
    """scripy_old.py v1 ContextUnet (no LocalEnhancer — the proven-runnable
    full-size config) vs our arch context_unet_v1."""
    ref_old = load_reference_module("scripy_old")
    if ref_old is None:
        pytest.skip("reference not mounted")
    torch.manual_seed(6)
    tmod = ref_old.ContextUnet(in_channels=3, n_feat=16, n_classes=3).eval()
    sd = {k: _np(v) for k, v in tmod.state_dict().items()}
    from diffusionmodel_tpu.compat.torch_convert import convert_context_unet_v1

    params, bs = convert_context_unet_v1(sd, norm="batch")
    jm = ContextUnet(in_ch=3, n_feat=16, n_classes=3, img_size=128,
                     norm="batch", use_local_enhancer=False)
    rng = np.random.RandomState(9)
    x = rng.randn(2, 128, 128, 3).astype(np.float32)
    c = np.array([0, 2], np.int64)
    t = np.array([0.2, 0.9], np.float32)
    ctx = np.array([1.0, 0.0], np.float32)
    got = np.asarray(jm.apply(
        {"params": params, "batch_stats": bs}, jnp.asarray(x),
        jnp.asarray(c.astype(np.int32)), jnp.asarray(t), jnp.asarray(ctx),
        attn_mask=None, train=False))
    with torch.no_grad():
        want = _np(tmod(torch.from_numpy(x).permute(0, 3, 1, 2),
                        torch.from_numpy(c), torch.from_numpy(t),
                        torch.from_numpy(ctx))).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


def test_full_cbam_unet_parity():
    """custom_dataset.py v1.5 CBAM ContextUnet vs our cbam_unet (n_classes=1
    + identity-patched local enhancer — Q3 applies to v1.5 too)."""
    ref_c = load_reference_module("custom_dataset")
    if ref_c is None:
        pytest.skip("reference not mounted")
    torch.manual_seed(7)
    tmod = ref_c.ContextUnet(in_channels=3, n_feat=16, n_classes=1).eval()
    tmod.local_enhance.forward = lambda x, mask: x
    sd = {k: _np(v) for k, v in tmod.state_dict().items()}
    from diffusionmodel_tpu.compat.torch_convert import convert_cbam_unet
    from diffusionmodel_tpu.nn.cbam_unet import CbamContextUnet

    params, bs = convert_cbam_unet(sd, norm="batch")
    jm = CbamContextUnet(in_ch=3, n_feat=16, n_classes=1, img_size=128,
                         norm="batch")
    rng = np.random.RandomState(10)
    x = rng.randn(2, 128, 128, 3).astype(np.float32)
    c = np.zeros((2,), np.int64)
    t = np.array([0.4, 0.6], np.float32)
    ctx = np.ones((2,), np.float32)
    got = np.asarray(jm.apply(
        {"params": params, "batch_stats": bs}, jnp.asarray(x),
        jnp.asarray(c.astype(np.int32)), jnp.asarray(t), jnp.asarray(ctx),
        attn_mask=None, train=False))
    with torch.no_grad():
        want = _np(tmod(torch.from_numpy(x).permute(0, 3, 1, 2),
                        torch.from_numpy(c), torch.from_numpy(t),
                        torch.from_numpy(ctx))).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


def test_load_checkpoint_pt_converts_weights(ref_mnist, tmp_path):
    """checkpoint.load_checkpoint on a torch .pt file must return CONVERTED
    flax trees (ADVICE r1: the tolerant loader previously handed raw torch
    state dicts to model.apply)."""
    torch.manual_seed(11)
    tmod = ref_mnist.ContextUnet(in_channels=1, n_feat=16, n_classes=10).eval()
    path = str(tmp_path / "ref.pt")
    torch.save({"model_state_dict": {
        f"nn_model.{k}": v for k, v in tmod.state_dict().items()},
        "epoch": 5}, path)

    from diffusionmodel_tpu.checkpoint import extract_params, load_checkpoint

    ckpt = load_checkpoint(path, arch="mnist_unet", norm="batch")
    params = extract_params(ckpt)
    assert int(ckpt["epoch"]) == 5
    jm = MnistContextUnet(in_ch=1, n_feat=16, n_classes=10, img_size=28,
                          norm="batch", mnist_style_ctx_flip=True)
    x = np.random.RandomState(12).randn(2, 28, 28, 1).astype(np.float32)
    got = np.asarray(jm.apply(
        {"params": params, "batch_stats": ckpt["batch_stats"]},
        jnp.asarray(x), jnp.zeros((2,), jnp.int32), jnp.full((2,), 0.5),
        jnp.ones((2,)), attn_mask=None, train=False))
    with torch.no_grad():
        want = _np(tmod(torch.from_numpy(x).permute(0, 3, 1, 2),
                        torch.zeros(2, dtype=torch.long),
                        torch.full((2,), 0.5),
                        torch.ones(2))).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)

    # without arch, extract_params must raise a clear error, not hand a raw
    # torch state dict to model.apply
    raw = load_checkpoint(path)
    with pytest.raises(ValueError, match="arch"):
        extract_params(raw)
