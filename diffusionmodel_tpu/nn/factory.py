"""Model factory: build the denoiser named by ModelConfig.arch."""

from __future__ import annotations

import jax.numpy as jnp

from diffusionmodel_tpu.config import ModelConfig
from diffusionmodel_tpu.nn.context_unet import ContextUnet
from diffusionmodel_tpu.nn.mnist_unet import MnistContextUnet


def build_model(mc: ModelConfig, high_thresh: float = 1.2,
                spatial_shards: int = 0):
    """``spatial_shards`` > 0 inserts H-axis sharding constraints for
    spatially-sharded mesh forwards (ContextUnet family only; see
    parallel.spatial.constrain_spatial)."""
    dtype = jnp.bfloat16 if mc.dtype == "bfloat16" else jnp.float32
    if mc.arch in ("context_unet_v2", "context_unet_v1"):
        return ContextUnet(
            in_ch=mc.in_ch,
            n_feat=mc.n_feat,
            n_classes=mc.n_classes,
            img_size=mc.img_size,
            norm=mc.norm,
            attn_reduction=mc.attn_reduction,
            use_coord_attn=mc.use_coord_attn,
            use_se=mc.use_se,
            use_local_enhancer=mc.use_local_enhancer
            and mc.arch == "context_unet_v2",
            high_thresh=high_thresh,
            mnist_style_ctx_flip=mc.mnist_style_ctx_flip,
            dtype=dtype,
            use_pallas=mc.use_pallas,
            fused_upsample=mc.fused_upsample,
            spatial_shards=spatial_shards,
        )
    if mc.arch == "mnist_unet":
        return MnistContextUnet(
            in_ch=mc.in_ch,
            n_feat=mc.n_feat,
            n_classes=mc.n_classes,
            img_size=mc.img_size,
            norm=mc.norm,
            mnist_style_ctx_flip=mc.mnist_style_ctx_flip,
            dtype=dtype,
        )
    if mc.arch == "ddpm_unet":
        from diffusionmodel_tpu.models.annotated_ddpm.unet import (
            DdpmUNetAdapter,
        )

        return DdpmUNetAdapter(
            image_channels=mc.in_ch,
            n_channels=mc.n_feat,
            ch_mults=tuple(mc.ch_mults),
            is_attn=tuple(mc.is_attn),
            n_blocks=mc.n_blocks,
            dropout=mc.dropout,
        )
    if mc.arch == "cbam_unet":
        from diffusionmodel_tpu.nn.cbam_unet import CbamContextUnet

        return CbamContextUnet(
            in_ch=mc.in_ch,
            n_feat=mc.n_feat,
            n_classes=mc.n_classes,
            img_size=mc.img_size,
            norm=mc.norm,
            dtype=dtype,
        )
    raise ValueError(f"unknown arch {mc.arch!r}")
