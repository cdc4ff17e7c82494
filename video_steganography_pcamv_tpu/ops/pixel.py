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

import numpy as np
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


import jax as _jax


@_jax.jit
def ssim_wxh(recon: jnp.ndarray, src: jnp.ndarray) -> jnp.ndarray:
    """x264-semantics SSIM sum over 8x8 windows at stride 4 (reference
    pixel.c:435-470 ssim_4x4x2_core/ssim_end1, driven per frame as in
    encoder.c:1069-1080 with the +2-pixel anti-DCT-alignment offset
    applied by the caller). recon/src: equal-shape int planes; the sum
    over ((w>>2)-1)*((h>>2)-1) windows is returned (normalization is
    the caller's, encoder.c:2605-2610)."""
    h, w = recon.shape
    bh, bw = h // 4, w // 4
    a = recon[:4 * bh, :4 * bw].astype(jnp.int32)
    b = src[:4 * bh, :4 * bw].astype(jnp.int32)

    def blksum(x):
        return x.reshape(bh, 4, bw, 4).sum(axis=(1, 3))
    s1 = blksum(a)
    s2 = blksum(b)
    ss = blksum(a * a) + blksum(b * b)
    s12 = blksum(a * b)

    def win(x):  # 2x2 block window sums -> [bh-1, bw-1]
        return (x[:-1, :-1] + x[:-1, 1:] + x[1:, :-1] + x[1:, 1:]) \
            .astype(jnp.float32)
    s1w, s2w, ssw, s12w = win(s1), win(s2), win(ss), win(s12)
    c1 = jnp.float32(int(.01 * .01 * 255 * 255 * 64 + .5))
    c2 = jnp.float32(int(.03 * .03 * 255 * 255 * 64 * 63 + .5))
    vars_ = ssw * 64 - s1w * s1w - s2w * s2w
    covar = s12w * 64 - s1w * s2w
    ssim = (2 * s1w * s2w + c1) * (2 * covar + c2) \
        / ((s1w * s1w + s2w * s2w + c1) * (vars_ + c2))
    return jnp.sum(ssim)


# Sylvester-order 8x8 Hadamard matrix (sa8d is invariant to row/col
# ordering and sign conventions of the Hadamard basis)
_H8 = np.array([[1 if bin(r & c).count("1") % 2 == 0 else -1
                 for c in range(8)] for r in range(8)], np.int32)


def sa8d_16x16(a, b):
    """x264_pixel_sa8d_16x16 (reference common/pixel.c:256-302): sum
    over the four 8x8 sub-blocks of |H8 (a-b) H8^T| summed, then
    (sum + 2) >> 2. a/b: [N, 16, 16] int32. Returns [N] int32."""
    import jax.numpy as jnp
    d = (a - b).reshape(-1, 2, 8, 2, 8).transpose(0, 1, 3, 2, 4)
    h = jnp.asarray(_H8)
    t = jnp.einsum("ij,nabjk,kl->nabil", h, d, h)
    s = jnp.sum(jnp.abs(t), axis=(1, 2, 3, 4))
    return (s + 2) >> 2
