"""Intra predictors, batched over N macroblocks (or N 4x4 blocks).

Reference: /root/reference/common/predict.c:52-837 (i16x16 modes
:52-180, chroma 8x8c :182-300, i4x4 nine modes :302-600). Rewritten as
batched tensor ops taking per-MB border vectors gathered by the
wavefront scheduler — a wave of independent MBs is predicted in one
shot for all modes at once.

Mode numbering follows the bitstream (spec 8.3.3 / 8.3.4 / 8.3.1):
  i16x16: 0=V 1=H 2=DC 3=Planar      chroma: 0=DC 1=H 2=V 3=Planar
  i4x4:   0=V 1=H 2=DC 3=DDL 4=DDR 5=VR 6=HD 7=VL 8=HU

The six directional i4x4 modes are expressed uniformly: every predicted
pixel is (c[i0] + 2*c[i1] + c[i2] + 2) >> 2 over the 13-sample border
vector c = [l3,l2,l1,l0,lt,t0..t7]; the spec's 2-tap (a+b+1)>>1 cases
use (i0,i1,i2) = (a,b,a), which is bit-identical ((2a+2b+2)>>2). The
index tables are generated from the spec formulas at import time, so
the device code is a single static gather + weighted sum over all
modes x pixels x blocks at once.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

I16_V, I16_H, I16_DC, I16_P = 0, 1, 2, 3
CH_DC, CH_H, CH_V, CH_P = 0, 1, 2, 3
I4_V, I4_H, I4_DC, I4_DDL, I4_DDR, I4_VR, I4_HD, I4_VL, I4_HU = range(9)


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


# ---------------------------------------------------------------------------
# i4x4 (spec 8.3.1.2; reference common/predict.c:302-600)
# ---------------------------------------------------------------------------

def _build_i4_tables() -> np.ndarray:
    """[6 modes (DDL..HU), 16 pixels, 3] indices into the 13-sample
    border vector, generated from the spec 8.3.1.2.4-9 formulas."""
    def L(i):   # l[i] -> c index; l[-1] is the top-left sample
        return 4 if i == -1 else 3 - i

    LT = 4

    def T(i):   # t[i] -> c index; t[-1] is the top-left sample
        return 4 if i == -1 else 5 + i

    out = np.zeros((6, 16, 3), np.int32)
    for y in range(4):
        for x in range(4):
            px = 4 * y + x
            # DDL (8.3.1.2.4)
            i = x + y
            out[0, px] = ((T(6), T(7), T(7)) if i == 6
                          else (T(i), T(i + 1), T(i + 2)))
            # DDR (8.3.1.2.5): uniform over [l3..l0, lt, t0..t3]
            k = 4 + x - y
            out[1, px] = (k - 1, k, k + 1)
            # VR (8.3.1.2.6)
            z = 2 * x - y
            i = x - (y >> 1)
            if z >= 0 and z % 2 == 0:
                out[2, px] = (T(i - 1), T(i), T(i - 1))        # 2-tap
            elif z >= 0:
                out[2, px] = (T(i - 2), T(i - 1), T(i))
            elif z == -1:
                out[2, px] = (L(0), LT, T(0))
            else:
                out[2, px] = (L(y - 1), L(y - 2), L(y - 3))
            # HD (8.3.1.2.7)
            z = 2 * y - x
            i = y - (x >> 1)
            if z >= 0 and z % 2 == 0:
                out[3, px] = (L(i - 1), L(i), L(i - 1))        # 2-tap
            elif z >= 0:
                out[3, px] = (L(i - 2), L(i - 1), L(i))
            elif z == -1:
                out[3, px] = (T(0), LT, L(0))
            else:
                out[3, px] = (T(x - 1), T(x - 2), T(x - 3))
            # VL (8.3.1.2.8)
            i = x + (y >> 1)
            if y % 2 == 0:
                out[4, px] = (T(i), T(i + 1), T(i))            # 2-tap
            else:
                out[4, px] = (T(i), T(i + 1), T(i + 2))
            # HU (8.3.1.2.9)
            z = x + 2 * y
            i = y + (x >> 1)
            if z < 5 and z % 2 == 0:
                out[5, px] = (L(i), L(i + 1), L(i))            # 2-tap
            elif z < 5:
                out[5, px] = (L(i), L(i + 1), L(i + 2))
            elif z == 5:
                out[5, px] = (L(2), L(3), L(3))
            else:
                out[5, px] = (L(3), L(3), L(3))
    return out


_I4_TABLES = _build_i4_tables()

# which modes are valid under (avail_top, avail_left):
#   DC always; V/DDL/VL need top; H/HU need left; DDR/VR/HD need both
I4_NEEDS_TOP = np.array([1, 0, 0, 1, 1, 1, 1, 1, 0], bool)
I4_NEEDS_LEFT = np.array([0, 1, 0, 0, 1, 1, 1, 0, 1], bool)


def predict_i4x4_all(top8, left, topleft, avail_top, avail_left):
    """All nine i4x4 predictions for N blocks.

    top8: [N,8] = t0..t7 with unavailable top-right already replicated
    from t3 (spec 8.3.1.2 sample substitution); left: [N,4] l0..l3;
    topleft: [N]; avail_*: [N] bool.
    Returns [N, 9, 4, 4] int32 (invalid modes still computed; callers
    mask their costs via I4_NEEDS_TOP/LEFT)."""
    n = top8.shape[0]
    # border vector c13 = [l3,l2,l1,l0,lt,t0..t7]
    c = jnp.concatenate([left[:, ::-1], topleft[:, None], top8], axis=1)

    v = jnp.broadcast_to(top8[:, None, :4], (n, 4, 4))
    h = jnp.broadcast_to(left[:, :, None], (n, 4, 4))
    dc = jnp.broadcast_to(
        _dc_pred(top8[:, :4], left, avail_top, avail_left, 4)
        [:, None, None], (n, 4, 4))

    tab = jnp.asarray(_I4_TABLES)                 # [6,16,3]
    g = c[:, tab]                                 # [N,6,16,3]
    dirs = (g[..., 0] + 2 * g[..., 1] + g[..., 2] + 2) >> 2
    dirs = dirs.reshape(n, 6, 4, 4)
    return jnp.concatenate(
        [jnp.stack([v, h, dc], axis=1), dirs], axis=1)
