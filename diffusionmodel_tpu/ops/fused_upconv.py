"""Exact fusion of bilinear-x2 (align_corners) upsample + 3x3 conv.

The reference's UnetUp head is ``nn.Upsample(scale_factor=2,
mode='bilinear', align_corners=True)`` followed by ``nn.Conv2d(in, out,
3, padding=1)`` (new_scripy.py:237-253). Computed literally, the pair
materializes the double-resolution input and then runs the conv's 9 taps
over ALL 4H*W output pixels — the single most expensive block of the
flagship forward (up4@128->256 = 141 ms, profile_blocks/RESULTS.md).

Because the align-corners upsample is two separable matmuls
(ops/resize.py: x_up = Mh @ x @ Mw^T) and a 3x3 conv is the sum of three
1x3 convs applied at H-offsets d in {-1,0,+1}, the H-matmul COMMUTES with
each 1x3 conv (they touch different axes):

    conv3x3(Mh @ x @ Mw^T) = sum_d  Mh^(d) @ conv1x3_{K[d]}(x @ Mw^T)

where Mh^(d)[p, i] = Mh[p+d-1, i] (zero rows where p+d-1 falls outside —
exactly the conv's zero padding on the upsampled grid). The three 1x3
convs run at HALF the rows (the un-upsampled H), stacked into ONE conv
with 3*C_out output channels; the three shifted H-matmuls contract as a
single [2H, 3*H] einsum. FLOPs for up4's pair drop ~42% (the 3x3 conv's
9 taps * 4HW becomes 9 taps * 2HW + two skinny resize matmuls), and the
4x-resolution C_in intermediate (2 GB at flagship batch 40) is never
materialized — the biggest single-block win available without changing
the architecture. Bit-exactness vs the unfused pair is pinned by
tests/test_ops.py (fp32) and the full-model parity suite.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np
from jax import lax

from diffusionmodel_tpu.ops.resize import _align_corners_matrix


@lru_cache(maxsize=32)
def _shifted_h_matrices(h: int) -> np.ndarray:
    """[3, 2h, h]: Mh shifted by d-1 rows, zero rows at the borders."""
    mh = _align_corners_matrix(h, 2 * h)
    pad = np.zeros((1, h), np.float32)
    mhp = np.concatenate([pad, mh, pad], axis=0)  # [2h+2, h]
    return np.stack([mhp[d:d + 2 * h] for d in range(3)])


def up2_conv3x3_align_corners(x: jnp.ndarray, kernel: jnp.ndarray,
                              bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """conv3x3(bilinear_up2_align_corners(x)) without materializing the
    upsampled tensor. x: [N,H,W,Cin]; kernel: [3,3,Cin,Cout] (flax HWIO);
    bias: [Cout] or None. Returns [N,2H,2W,Cout]."""
    n, h, w, cin = x.shape
    cout = kernel.shape[-1]
    dt = x.dtype
    # All three stages compute in the operand dtype dt — the same
    # precision profile as the unfused pair (flax conv in bf16 emits a
    # bf16 result; the MXU still accumulates each dot in fp32
    # internally). Under fp32 the pair is bit-equivalent to the unfused
    # formulation up to summation order. Do NOT set
    # preferred_element_type=f32 here: a widened output makes the VJP
    # convolve an f32 cotangent against the bf16 kernel, which
    # lax.conv_general_dilated rejects (mixed-dtype operands) — the
    # fused path must stay differentiable for train-step use (bench.py).
    mw = jnp.asarray(_align_corners_matrix(w, 2 * w)).astype(dt)
    eh = jnp.asarray(_shifted_h_matrices(h)).astype(dt)
    # 1) W-upsample (half-size intermediate: H x 2W)
    xw = jnp.einsum("ow,nhwc->nhoc", mw, x)
    # 2) the three 1x3 row-convs as ONE conv with 3*Cout channels:
    #    kstack[..., d*Cout:(d+1)*Cout] = kernel[d]
    kstack = jnp.concatenate([kernel[d] for d in range(3)],
                             axis=-1)[None]  # [1,3,Cin,3*Cout]
    c = lax.conv_general_dilated(
        xw, kstack.astype(dt), window_strides=(1, 1),
        padding=((0, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    c = c.reshape(n, h, 2 * w, 3, cout)
    # 3) the three shifted H-upsample matmuls, contracted in one einsum
    y = jnp.einsum("dph,nhwdc->npwc", eh, c)
    if bias is not None:
        y = y + bias.astype(dt)
    return y.astype(dt)
