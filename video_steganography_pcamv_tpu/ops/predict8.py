"""Intra 8x8 (High profile) prediction: edge filter + all nine modes,
batched over blocks.

Reference: /root/reference/common/predict.c:505-760
(x264_predict_8x8_filter and predict_8x8_{v,h,dc*,ddl,ddr,vr,hd,vl,hu}),
which implement spec 8.3.2.2. Same design as the i4x4 machinery in
ops/predict.py: the directional modes are a static [6, 64, 3] index
table into the 33-sample FILTERED edge vector, evaluated as one gather
+ (a + 2b + c + 2) >> 2 (two-tap rows use (a, b, a)).

Edge layout (predict.c:506-509): edge[7..14] = l7..l0, edge[15] = lt,
edge[16..31] = t0..t15, edge[32] = t15.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _L(i):
    return 15 if i == -1 else 14 - i


_LT = 15


def _T(i):
    return 15 if i == -1 else 16 + i


def _build_i8_tables() -> np.ndarray:
    """[6 modes (DDL,DDR,VR,HD,VL,HU), 64 pixels, 3] edge indices."""
    out = np.zeros((6, 64, 3), np.int32)
    for y in range(8):
        for x in range(8):
            px = 8 * y + x
            # DDL (predict.c:608-627)
            i = x + y
            out[0, px] = ((_T(14), _T(15), _T(15)) if i == 14
                          else (_T(i), _T(i + 1), _T(i + 2)))
            # DDR (:628-646): uniform over edge[7..23]
            d = x - y
            out[1, px] = (14 + d, 15 + d, 16 + d)
            # VR (:647-673)
            z = 2 * x - y
            i = x - (y >> 1)
            if z >= 0 and z % 2 == 0:
                out[2, px] = (_T(i - 1), _T(i), _T(i - 1))
            elif z >= 0:
                out[2, px] = (_T(i - 2), _T(i - 1), _T(i))
            elif z == -1:
                out[2, px] = (_L(0), _LT, _T(0))
            else:
                out[2, px] = (_L(y - 2 * x - 1), _L(y - 2 * x - 2),
                              _L(y - 2 * x - 3))
            # HD (:674-700)
            z = 2 * y - x
            i = y - (x >> 1)
            if z >= 0 and z % 2 == 0:
                out[3, px] = (_L(i - 1), _L(i), _L(i - 1))
            elif z >= 0:
                out[3, px] = (_L(i - 2), _L(i - 1), _L(i))
            elif z == -1:
                out[3, px] = (_T(0), _LT, _L(0))
            else:
                out[3, px] = (_T(x - 2 * y - 1), _T(x - 2 * y - 2),
                              _T(x - 2 * y - 3))
            # VL (:701-727)
            i = x + (y >> 1)
            if y % 2 == 0:
                out[4, px] = (_T(i), _T(i + 1), _T(i))
            else:
                out[4, px] = (_T(i), _T(i + 1), _T(i + 2))
            # HU (:728-747)
            z = x + 2 * y
            i = y + (x >> 1)
            if z < 13 and z % 2 == 0:
                out[5, px] = (_L(i), _L(i + 1), _L(i))
            elif z < 13:
                out[5, px] = (_L(i), _L(i + 1), _L(i + 2))
            elif z == 13:
                out[5, px] = (_L(6), _L(7), _L(7))
            else:
                out[5, px] = (_L(7), _L(7), _L(7))
    return out


_I8_TABLES = _build_i8_tables()

# mode numbering (spec 8.3.2.1): 0 V, 1 H, 2 DC, 3 DDL, 4 DDR, 5 VR,
# 6 HD, 7 VL, 8 HU
I8_NEEDS_TOP = np.array([1, 0, 0, 1, 1, 1, 1, 1, 0], bool)
I8_NEEDS_LEFT = np.array([0, 1, 0, 0, 1, 1, 1, 0, 1], bool)


def filter_edges(lt, top, left, have_lt, have_tr):
    """x264_predict_8x8_filter (predict.c:510-541), batched.

    lt: [N]; top: [N, 16] raw (t8..t15 = caller-substituted copies of
    t7 when top-right is unavailable, matching the !have_tr fill);
    left: [N, 8]; have_lt/have_tr: [N] bool. Returns edge [N, 33].
    Entries for absent neighbours are computed from whatever raw values
    the caller passed — only modes whose neighbours exist may read
    them (the caller masks modes by availability)."""
    lt = lt.astype(jnp.int32)
    t = top.astype(jnp.int32)
    l = left.astype(jnp.int32)
    n = lt.shape[0]
    e = jnp.zeros((n, 33), jnp.int32)

    def f2(a, b, c):
        return (a + 2 * b + c + 2) >> 2

    # left column: edge[15]=filtered lt, edge[14..7]=filtered l0..l7
    e = e.at[:, 15].set((t[:, 0] + 2 * lt + l[:, 0] + 2) >> 2)
    lt_or_l0 = jnp.where(have_lt, lt, l[:, 0])
    e = e.at[:, 14].set((lt_or_l0 + 2 * l[:, 0] + l[:, 1] + 2) >> 2)
    for yy in range(1, 7):
        e = e.at[:, 14 - yy].set(f2(l[:, yy - 1], l[:, yy], l[:, yy + 1]))
    e = e.at[:, 7].set((l[:, 6] + 3 * l[:, 7] + 2) >> 2)

    # top row: edge[16..23] = filtered t0..t7
    lt_or_t0 = jnp.where(have_lt, lt, t[:, 0])
    e = e.at[:, 16].set((lt_or_t0 + 2 * t[:, 0] + t[:, 1] + 2) >> 2)
    for xx in range(1, 7):
        e = e.at[:, 16 + xx].set(f2(t[:, xx - 1], t[:, xx], t[:, xx + 1]))
    t8_or_t7 = jnp.where(have_tr, t[:, 8], t[:, 7])
    e = e.at[:, 23].set((t[:, 6] + 2 * t[:, 7] + t8_or_t7 + 2) >> 2)

    # top-right: filtered t8..t15 when present, else replicated t7
    tr = jnp.zeros((n, 9), jnp.int32)
    for xx in range(8, 15):
        tr = tr.at[:, xx - 8].set(f2(t[:, xx - 1], t[:, xx],
                                     t[:, jnp.minimum(xx + 1, 15)]))
    last = (t[:, 14] + 3 * t[:, 15] + 2) >> 2
    tr = tr.at[:, 7].set(last)
    tr = tr.at[:, 8].set(last)
    rep = jnp.repeat(t[:, 7:8], 9, axis=1)
    e = e.at[:, 24:33].set(jnp.where(have_tr[:, None], tr, rep))
    return e


def predict_i8x8_all(edge, avail_top, avail_left):
    """All nine 8x8 predictions from filtered edges.

    edge: [N, 33]; avail_*: [N] bool. Returns [N, 9, 8, 8] int32 with
    DC falling back to left-only/top-only/128 exactly as the reference
    dispatches its dc variants (predict.c predict_8x8_dc_*)."""
    n = edge.shape[0]
    tab = jnp.asarray(_I8_TABLES)              # [6,64,3]
    g = edge[:, tab]                           # [N,6,64,3]
    diag = (g[..., 0] + 2 * g[..., 1] + g[..., 2] + 2) >> 2
    diag = diag.reshape(n, 6, 8, 8)

    lcol = edge[:, 14:6:-1]                    # l0..l7
    trow = edge[:, 16:24]                      # t0..t7
    v = jnp.broadcast_to(trow[:, None, :], (n, 8, 8))
    h = jnp.broadcast_to(lcol[:, :, None], (n, 8, 8))

    suml = jnp.sum(lcol, axis=1)
    sumt = jnp.sum(trow, axis=1)
    both = (suml + sumt + 8) >> 4
    only_l = (suml + 4) >> 3
    only_t = (sumt + 4) >> 3
    dcv = jnp.where(avail_top & avail_left, both,
                    jnp.where(avail_left, only_l,
                              jnp.where(avail_top, only_t, 128)))
    dc = jnp.broadcast_to(dcv[:, None, None], (n, 8, 8))

    return jnp.stack([v, h, dc, diag[:, 0], diag[:, 1], diag[:, 2],
                      diag[:, 3], diag[:, 4], diag[:, 5]], axis=1)
