"""Numerical validation of the InceptionV3 FID trunk against torch.

torchvision is not installed in this image, but torch is — so this file
re-states torchvision's inception_v3 module structure (same submodule
names, so state_dict keys match ``convert_torchvision_inception``) with
RANDOM weights, converts them, and asserts activation equality per block
and through the full 299px trunk. This makes the FID feature extractor
falsifiable: any layout/padding/BN mistake in the port or the converter
breaks these tests (the round-2 fix of avg-pool count_include_pad was
found exactly this way).

Mirror of torchvision/models/inception.py (v0.15 structure, which is what
the reference's ``models.inception_v3(pretrained=True)`` builds,
new_scripy.py:1120-1127).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from diffusionmodel_tpu.metrics.inception import (  # noqa: E402

    InceptionA,
    InceptionB,
    InceptionC,
    InceptionD,
    InceptionE,
    InceptionV3Features,
    convert_torchvision_inception,
)


# ---------------------------------------------------------------------------
# torch mirror of torchvision inception blocks (same attribute names)
# ---------------------------------------------------------------------------



pytestmark = pytest.mark.slow  # excluded from the quick tier (-m "not slow")

class TBasicConv2d(tnn.Module):
    def __init__(self, in_ch, out_ch, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(in_ch, out_ch, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(out_ch, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TInceptionA(tnn.Module):
    def __init__(self, in_ch, pool_features):
        super().__init__()
        self.branch1x1 = TBasicConv2d(in_ch, 64, kernel_size=1)
        self.branch5x5_1 = TBasicConv2d(in_ch, 48, kernel_size=1)
        self.branch5x5_2 = TBasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TBasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TBasicConv2d(in_ch, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b5, b3, bp], 1)


class TInceptionB(tnn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3 = TBasicConv2d(in_ch, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TBasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([b3, bd, F.max_pool2d(x, 3, stride=2)], 1)


class TInceptionC(tnn.Module):
    def __init__(self, in_ch, channels_7x7):
        super().__init__()
        c7 = channels_7x7
        self.branch1x1 = TBasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7_1 = TBasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7_2 = TBasicConv2d(c7, c7, kernel_size=(1, 7),
                                        padding=(0, 3))
        self.branch7x7_3 = TBasicConv2d(c7, 192, kernel_size=(7, 1),
                                        padding=(3, 0))
        self.branch7x7dbl_1 = TBasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7dbl_2 = TBasicConv2d(c7, c7, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7dbl_3 = TBasicConv2d(c7, c7, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch7x7dbl_4 = TBasicConv2d(c7, c7, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7dbl_5 = TBasicConv2d(c7, 192, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch_pool = TBasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b7, bd, bp], 1)


class TInceptionD(tnn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3_1 = TBasicConv2d(in_ch, 192, kernel_size=1)
        self.branch3x3_2 = TBasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TBasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7x3_2 = TBasicConv2d(192, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7x3_3 = TBasicConv2d(192, 192, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7x3_4 = TBasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
            self.branch7x7x3_1(x))))
        return torch.cat([b3, b7, F.max_pool2d(x, 3, stride=2)], 1)


class TInceptionE(tnn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch1x1 = TBasicConv2d(in_ch, 320, kernel_size=1)
        self.branch3x3_1 = TBasicConv2d(in_ch, 384, kernel_size=1)
        self.branch3x3_2a = TBasicConv2d(384, 384, kernel_size=(1, 3),
                                         padding=(0, 1))
        self.branch3x3_2b = TBasicConv2d(384, 384, kernel_size=(3, 1),
                                         padding=(1, 0))
        self.branch3x3dbl_1 = TBasicConv2d(in_ch, 448, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TBasicConv2d(384, 384, kernel_size=(1, 3),
                                            padding=(0, 1))
        self.branch3x3dbl_3b = TBasicConv2d(384, 384, kernel_size=(3, 1),
                                            padding=(1, 0))
        self.branch_pool = TBasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b3, bd, bp], 1)


class TInceptionTrunk(tnn.Module):
    """fc-stripped torchvision inception_v3 trunk (transform_input=False)."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TBasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TBasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TBasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TBasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = TInceptionA(192, 32)
        self.Mixed_5c = TInceptionA(256, 64)
        self.Mixed_5d = TInceptionA(288, 64)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128)
        self.Mixed_6c = TInceptionC(768, 160)
        self.Mixed_6d = TInceptionC(768, 160)
        self.Mixed_6e = TInceptionC(768, 192)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280)
        self.Mixed_7c = TInceptionE(2048)

    def forward(self, x):
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Mixed_5b(x)
        x = self.Mixed_5c(x)
        x = self.Mixed_5d(x)
        x = self.Mixed_6a(x)
        x = self.Mixed_6b(x)
        x = self.Mixed_6c(x)
        x = self.Mixed_6d(x)
        x = self.Mixed_6e(x)
        x = self.Mixed_7a(x)
        x = self.Mixed_7b(x)
        x = self.Mixed_7c(x)
        return x.mean(dim=(2, 3))  # adaptive avg pool, fc stripped


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _randomize(module: tnn.Module, seed: int) -> None:
    """Random-but-stable weights: convs keep their kaiming init (healthy
    activation scale through 90+ layers); BN affine + running stats are
    randomized away from identity so scale/bias/mean/var conversion
    mistakes cannot cancel out."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.weight.copy_(0.5 + torch.rand(m.weight.shape, generator=g))
                m.bias.copy_(0.1 * torch.randn(m.bias.shape, generator=g))
                m.running_mean.copy_(
                    0.05 * torch.randn(m.running_mean.shape, generator=g))
                m.running_var.copy_(
                    0.8 + 0.4 * torch.rand(m.running_var.shape, generator=g))
    module.eval()


def _convert(tmod: tnn.Module, prefix: str = "M"):
    """Route a single block's state dict through the REAL converter by
    namespacing it like a trunk submodule."""
    sd = {f"{prefix}.{k}": v.detach().numpy()
          for k, v in tmod.state_dict().items()}
    params, stats = convert_torchvision_inception(sd)
    return params[prefix], stats[prefix]


def _cross_check(tmod, jmod, in_ch, hw, seed, atol=2e-4, rtol=2e-3):
    _randomize(tmod, seed)
    params, stats = _convert(tmod)
    x = np.random.RandomState(seed).rand(2, hw, hw, in_ch).astype(np.float32)
    got = np.asarray(jmod.apply({"params": params, "batch_stats": stats},
                                jnp.asarray(x)))
    with torch.no_grad():
        want = tmod(torch.from_numpy(x).permute(0, 3, 1, 2)
                    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=atol, rtol=rtol)


# ---------------------------------------------------------------------------
# per-block golden tests
# ---------------------------------------------------------------------------


def test_basic_conv2d_block():
    _cross_check(TBasicConv2d(8, 16, kernel_size=3, stride=2),
                 _JBasic(16, (3, 3), stride=2), 8, 17, 100)


class _JBasic:
    """Adapter: InceptionV3Features' BasicConv2d with an apply() like a
    flax module rooted at the converter's namespaced path."""

    def __init__(self, out_ch, kernel, stride=1, padding=0):
        from diffusionmodel_tpu.metrics.inception import BasicConv2d

        self.mod = BasicConv2d(out_ch, kernel, stride=stride, padding=padding)

    def apply(self, variables, x):
        # converter emits {...: {conv: .., bn: ..}} for a block whose
        # flax submodules are named conv/bn — same tree, direct apply
        return self.mod.apply(variables, x)


def test_inception_a_block():
    _cross_check(TInceptionA(64, 32), InceptionA(32), 64, 19, 101)


def test_inception_b_block():
    _cross_check(TInceptionB(96), InceptionB(), 96, 19, 102)


def test_inception_c_block():
    _cross_check(TInceptionC(128, 64), InceptionC(64), 128, 17, 103)


def test_inception_d_block():
    _cross_check(TInceptionD(128), InceptionD(), 128, 17, 104)


def test_inception_e_block():
    _cross_check(TInceptionE(160), InceptionE(), 160, 8, 105)


def test_full_trunk_299():
    """Full fc-stripped trunk on 299x299 input -> pooled 2048-d features."""
    tmod = TInceptionTrunk()
    _randomize(tmod, 106)
    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
    params, stats = convert_torchvision_inception(sd)

    x = np.random.RandomState(9).rand(2, 299, 299, 3).astype(np.float32)
    jmod = InceptionV3Features()
    got = np.asarray(jmod.apply({"params": params, "batch_stats": stats},
                                jnp.asarray(x)))
    with torch.no_grad():
        want = tmod(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    assert got.shape == (2, 2048)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-3)


def test_feature_pipeline_parity_vs_torch():
    """ImageMetrics.extract_features' full preprocessing ([-1,1]->[0,1]
    renorm, half-pixel bilinear resize to 299, trunk forward) vs the
    reference pipeline in torch (new_scripy.py:1130-1143). The Frechet
    formula itself is pinned against scipy in test_metrics; this closes the
    remaining FID gap: the feature vectors. (A random-weight 94-layer trunk
    collapses batch variance to ~1e-9, so comparing FID *numbers* here is
    vacuous — feature vectors are the meaningful comparison.)"""
    from diffusionmodel_tpu.metrics.image_metrics import ImageMetrics

    tmod = TInceptionTrunk()
    _randomize(tmod, 107)
    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
    params, stats = convert_torchvision_inception(sd)

    import jax

    jmod = InceptionV3Features()
    variables = {"params": params, "batch_stats": stats}
    feature_fn = jax.jit(lambda x: jmod.apply(variables, x))

    rng = np.random.RandomState(11)
    real = (rng.rand(6, 64, 64, 3).astype(np.float32)) * 2 - 1  # [-1,1]

    m = ImageMetrics(feature_fn=feature_fn, batch_size=4)
    ours = m.extract_features(real)

    t = torch.from_numpy(real).permute(0, 3, 1, 2)
    t = (t + 1) / 2
    t = F.interpolate(t, size=(299, 299), mode="bilinear",
                      align_corners=False)
    with torch.no_grad():
        want = tmod(t).numpy()
    assert ours.shape == (6, 2048)
    np.testing.assert_allclose(ours, want, atol=5e-4, rtol=5e-3)
