"""Stable-Diffusion-style VAE (capability mirror of
reference/stable_diffusion/model/autoencoder.py), NHWC / flax.

Encoder: ch=128 x mults (1,2,4,4), 2 resnet blocks/level, asymmetric-pad
stride-2 downsample (:363-372), mid resnet-attn-resnet, GN32(eps 1e-6) +
swish head -> 2*z moments; quant_conv -> GaussianDistribution (mean/logvar
chunk, logvar clamped to [-30, 20], reparam sample, :253-272). Decoder is
the mirror. TPU-first notes: spatial attention uses einsum over HW tokens
(MXU); swap in the Pallas flash-attention for large maps.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def swish(x):
    return x * nn.sigmoid(x)


def gn32(x, name=None):
    g = 32 if x.shape[-1] % 32 == 0 else 1
    return nn.GroupNorm(num_groups=g, epsilon=1e-6, name=name)(x)


class ResnetBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):
        h = gn32(x)
        h = swish(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv1")(h)
        h = gn32(h)
        h = swish(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """1x1-conv QKV spatial self-attention (autoencoder.py:275-336)."""

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hn = gn32(x, name="norm")
        q = nn.Conv(c, (1, 1), name="q")(hn).reshape(b, h * w, c)
        k = nn.Conv(c, (1, 1), name="k")(hn).reshape(b, h * w, c)
        v = nn.Conv(c, (1, 1), name="v")(hn).reshape(b, h * w, c)
        attn = jnp.einsum("bic,bjc->bij", q, k) * (c ** -0.5)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bij,bjc->bic", attn, v).reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), name="proj_out")(out)
        return x + out


class Encoder(nn.Module):
    channels: int = 128
    ch_mults: Tuple[int, ...] = (1, 2, 4, 4)
    n_resnet: int = 2
    z_channels: int = 4

    @nn.compact
    def __call__(self, img):
        x = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv_in")(img)
        for i, mult in enumerate(self.ch_mults):
            ch = self.channels * mult
            for j in range(self.n_resnet):
                x = ResnetBlock(ch, name=f"down_{i}_block_{j}")(x)
            if i != len(self.ch_mults) - 1:
                # asymmetric padding (0,1,0,1) then stride-2 VALID conv
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            name=f"down_{i}_downsample")(x)
        x = ResnetBlock(x.shape[-1], name="mid_block_1")(x)
        x = AttnBlock(name="mid_attn")(x)
        x = ResnetBlock(x.shape[-1], name="mid_block_2")(x)
        x = gn32(x, name="norm_out")
        x = swish(x)
        return nn.Conv(2 * self.z_channels, (3, 3), padding=((1, 1), (1, 1)),
                       name="conv_out")(x)


class Decoder(nn.Module):
    channels: int = 128
    ch_mults: Tuple[int, ...] = (1, 2, 4, 4)
    n_resnet: int = 2
    out_channels: int = 3

    @nn.compact
    def __call__(self, z):
        ch = self.channels * self.ch_mults[-1]
        x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), name="conv_in")(z)
        x = ResnetBlock(ch, name="mid_block_1")(x)
        x = AttnBlock(name="mid_attn")(x)
        x = ResnetBlock(ch, name="mid_block_2")(x)
        for i, mult in reversed(list(enumerate(self.ch_mults))):
            ch = self.channels * mult
            for j in range(self.n_resnet + 1):
                x = ResnetBlock(ch, name=f"up_{i}_block_{j}")(x)
            if i != 0:
                b, hh, ww, c = x.shape
                x = jax.image.resize(x, (b, hh * 2, ww * 2, c), "nearest")
                x = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)),
                            name=f"up_{i}_upsample")(x)
        x = gn32(x, name="norm_out")
        x = swish(x)
        return nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       name="conv_out")(x)


class GaussianDistribution:
    """Moments -> reparameterized sample (autoencoder.py:253-272)."""

    def __init__(self, moments: jnp.ndarray):
        self.mean, logvar = jnp.split(moments, 2, axis=-1)
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)

    def sample(self, key):
        return self.mean + self.std * jax.random.normal(
            key, self.mean.shape, dtype=self.mean.dtype)


class Autoencoder(nn.Module):
    """encode -> GaussianDistribution via quant_conv; decode via
    post_quant_conv (autoencoder.py:25-71)."""

    channels: int = 128
    ch_mults: Tuple[int, ...] = (1, 2, 4, 4)
    z_channels: int = 4
    emb_channels: int = 4

    def setup(self):
        self.encoder = Encoder(self.channels, self.ch_mults,
                               z_channels=self.z_channels)
        self.decoder = Decoder(self.channels, self.ch_mults)
        self.quant_conv = nn.Conv(2 * self.emb_channels, (1, 1))
        self.post_quant_conv = nn.Conv(self.z_channels, (1, 1))

    def encode(self, img) -> GaussianDistribution:
        return GaussianDistribution(self.quant_conv(self.encoder(img)))

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, img, key):
        dist = self.encode(img)
        return self.decode(dist.sample(key)), dist
