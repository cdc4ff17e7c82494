"""Pixel comparison metrics, whole-frame batched.

Reference: /root/reference/common/pixel.c (SAD :40-65, SATD :187-253,
SSD, SSIM :435-470). Instead of per-block scalar loops dispatched through
a function-pointer table, these operate on arbitrary leading batch axes
with the block geometry expressed via the coefficient-plane layout, so a
whole frame (or a [MB, candidates] tensor) is one VPU pass.

Divergence note: x264 computes SATD as sum over 8x4 halves with a final
>>1 per 8x4 (pixel.c:233-253); we halve per 4x4. Differences are at most
+-1 per 4x4 pair and only affect mode *decisions*, never conformance.
"""

from __future__ import annotations

import jax.numpy as jnp

from .blocks import to_blocks
from .transform import hadamard4x4


def sad(a: jnp.ndarray, b: jnp.ndarray, block: int = 16) -> jnp.ndarray:
    """Sum of absolute differences over non-overlapping block x block
    tiles of the last two axes. Returns [..., H/block, W/block]."""
    d = jnp.abs(a.astype(jnp.int32) - b.astype(jnp.int32))
    bl = to_blocks(d, block)
    return jnp.sum(bl, axis=(-4, -3))


def ssd(a: jnp.ndarray, b: jnp.ndarray, block: int = 16) -> jnp.ndarray:
    d = a.astype(jnp.int32) - b.astype(jnp.int32)
    bl = to_blocks(d * d, block)
    return jnp.sum(bl, axis=(-4, -3))


def satd4(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-4x4 SATD: (sum |WHT4(a-b)|) >> 1 (pixel.c:187-209).
    a, b: [..., H, W]; returns [..., H/4, W/4]."""
    d = to_blocks(a.astype(jnp.int32) - b.astype(jnp.int32), 4)
    h = hadamard4x4(d)
    return jnp.sum(jnp.abs(h), axis=(-4, -3)) >> 1


def satd(a: jnp.ndarray, b: jnp.ndarray, block: int = 16) -> jnp.ndarray:
    """SATD summed to block x block tiles. Returns [..., H/blk, W/blk]."""
    s4 = satd4(a, b)
    return jnp.sum(to_blocks(s4, block // 4), axis=(-4, -3))


def sum_frame(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(x, axis=(-2, -1))


def psnr_from_ssd(ssd_val: float, n_pixels: int) -> float:
    """Global PSNR from summed SSD (encoder.c:2590-2610)."""
    import math
    if ssd_val <= 0:
        return 99.99
    mse = ssd_val / n_pixels
    return 10.0 * math.log10(255.0 * 255.0 / mse)
