"""Intra predictors, batched over N macroblocks.

Reference: /root/reference/common/predict.c:52-600 (i16x16 modes
:52-180, chroma 8x8c :182-300). Rewritten as batched tensor ops taking
per-MB border vectors gathered by the wavefront scheduler — a wave of
independent MBs is predicted in one shot for all modes at once.

Mode numbering follows the bitstream (spec 8.3.3 / 8.3.4):
  i16x16: 0=V 1=H 2=DC 3=Planar      chroma: 0=DC 1=H 2=V 3=Planar
"""

from __future__ import annotations

import jax.numpy as jnp

I16_V, I16_H, I16_DC, I16_P = 0, 1, 2, 3
CH_DC, CH_H, CH_V, CH_P = 0, 1, 2, 3


def _dc_pred(top, left, avail_top, avail_left, n: int):
    """DC value per spec: both -> (sum+n)>>log2(2n); one -> (sum+n/2)>>log2(n);
    none -> 128. top/left: [N, n]; avail: [N] bool. Returns [N]."""
    st = jnp.sum(top, axis=-1)
    sl = jnp.sum(left, axis=-1)
    import math
    lg = int(math.log2(n))
    both = (st + sl + n) >> (lg + 1)
    only_t = (st + n // 2) >> lg
    only_l = (sl + n // 2) >> lg
    return jnp.where(
        avail_top & avail_left, both,
        jnp.where(avail_top, only_t,
                  jnp.where(avail_left, only_l, 128)))


def _planar(top, left, topleft, n: int):
    """Plane prediction (spec 8.3.3.4 / 8.3.4.4). top/left: [N, n],
    topleft: [N]. Returns [N, n, n]."""
    half = n // 2
    xs = jnp.arange(1, half + 1)  # [half]
    # H' = sum x * (p[half-1+x, -1] - p[half-1-x, -1]); x=half term uses topleft
    top_hi = top[:, half - 1 + xs]                       # [N, half]
    top_lo = jnp.concatenate(
        [top[:, half - 1 - xs[:-1]], topleft[:, None]], axis=1)
    hgrad = jnp.sum(xs * (top_hi - top_lo), axis=-1)
    left_hi = left[:, half - 1 + xs]
    left_lo = jnp.concatenate(
        [left[:, half - 1 - xs[:-1]], topleft[:, None]], axis=1)
    vgrad = jnp.sum(xs * (left_hi - left_lo), axis=-1)
    if n == 16:
        b = (5 * hgrad + 32) >> 6
        c = (5 * vgrad + 32) >> 6
    else:  # n == 8
        b = (17 * hgrad + 16) >> 5
        c = (17 * vgrad + 16) >> 5
    a = 16 * (top[:, n - 1] + left[:, n - 1])
    x = jnp.arange(n)
    grid = (a[:, None, None]
            + b[:, None, None] * (x[None, None, :] - (half - 1))
            + c[:, None, None] * (x[None, :, None] - (half - 1)) + 16) >> 5
    return jnp.clip(grid, 0, 255)


def predict_i16x16_all(top, left, topleft, avail_top, avail_left):
    """All four i16x16 predictions.

    top/left: [N,16] int32; topleft: [N]; avail_*: [N] bool.
    Returns [N, 4, 16, 16] int32 (invalid modes still computed; caller
    masks their costs)."""
    n = top.shape[0]
    v = jnp.broadcast_to(top[:, None, :], (n, 16, 16))
    h = jnp.broadcast_to(left[:, :, None], (n, 16, 16))
    dc = jnp.broadcast_to(
        _dc_pred(top, left, avail_top, avail_left, 16)[:, None, None],
        (n, 16, 16))
    pl = _planar(top, left, topleft, 16)
    return jnp.stack([v, h, dc, pl], axis=1)


def _chroma_dc(top, left, avail_top, avail_left):
    """Chroma DC is per-4x4 quadrant (spec 8.3.4.1). top/left: [N,8].
    Returns [N,8,8]."""
    t0 = jnp.sum(top[:, :4], axis=-1)
    t1 = jnp.sum(top[:, 4:], axis=-1)
    l0 = jnp.sum(left[:, :4], axis=-1)
    l1 = jnp.sum(left[:, 4:], axis=-1)
    at, al = avail_top, avail_left

    def q(sum_t, sum_l):
        both = (sum_t + sum_l + 4) >> 3
        ot = (sum_t + 2) >> 2
        ol = (sum_l + 2) >> 2
        return jnp.where(at & al, both,
                         jnp.where(at, ot, jnp.where(al, ol, 128)))

    # corner quadrants prefer the "straight" neighbour when only one exists
    q00 = q(t0, l0)
    q01 = jnp.where(at, (t1 + 2) >> 2, jnp.where(al, (l0 + 2) >> 2, 128))
    q10 = jnp.where(al, (l1 + 2) >> 2, jnp.where(at, (t0 + 2) >> 2, 128))
    q11 = q(t1, l1)
    quad = jnp.stack([jnp.stack([q00, q01], -1),
                      jnp.stack([q10, q11], -1)], -2)  # [N,2,2]
    return jnp.repeat(jnp.repeat(quad, 4, axis=-2), 4, axis=-1)


def predict_chroma_all(top, left, topleft, avail_top, avail_left):
    """All four chroma predictions. top/left: [N,8]. Returns [N,4,8,8]."""
    n = top.shape[0]
    dc = _chroma_dc(top, left, avail_top, avail_left)
    h = jnp.broadcast_to(left[:, :, None], (n, 8, 8))
    v = jnp.broadcast_to(top[:, None, :], (n, 8, 8))
    pl = _planar(top, left, topleft, 8)
    return jnp.stack([dc, h, v, pl], axis=1)
