"""High-profile 8x8 transform family: integer DCT8/IDCT8, quant/dequant
with CQM-capable tables, and the 8x8 zigzag.

Reference: /root/reference/common/dct.c:236-330 (DCT8_1D / IDCT8_1D
butterflies, sub8x8_dct8, add8x8_idct8), /root/reference/common/quant.c:
42-48 (quant_8x8), :111-140 (dequant_8x8), and the table construction in
/root/reference/common/set.c:45-66 (quant8_scan + scale tables) and
:68-166 (x264_cqm_init: position classes, scaling-list application,
per-qp SHIFT and deadzone bias). All integer arithmetic is reproduced
exactly; batched over [..., 8, 8] blocks instead of the per-block C
loops.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# position-class scan for 8x8 (set.c:45-48): class of raster position i
# is quant8_scan[((i>>1)&12) | (i&3)]
_QUANT8_SCAN = np.array([0, 3, 4, 3, 3, 1, 5, 1, 4, 5, 2, 5, 3, 1, 5, 1],
                        np.int64)
_DEQUANT8_SCALE = np.array([
    [20, 18, 32, 19, 25, 24],
    [22, 19, 35, 21, 28, 26],
    [26, 23, 42, 24, 33, 31],
    [28, 25, 45, 26, 35, 33],
    [32, 28, 51, 30, 40, 38],
    [36, 32, 58, 34, 46, 43],
], np.int64)
_QUANT8_SCALE = np.array([
    [13107, 11428, 20972, 12222, 16777, 15481],
    [11916, 10826, 19174, 11058, 14980, 14290],
    [10082, 8943, 15978, 9675, 12710, 11985],
    [9362, 8228, 14913, 8931, 11984, 11259],
    [8192, 7346, 13159, 7740, 10486, 9777],
    [7282, 6428, 11570, 6830, 9118, 8640],
], np.int64)

# flat (default) scaling list; CQM presets replace these (x264 --cqm)
FLAT16 = np.full(64, 16, np.int64)

# JVT sample matrices (x264_cqm_jvt8i / jvt8p in common/set.c — the
# normative JM sample CQMs selected by --cqm jvt)
JVT8I = np.array([
    6, 10, 13, 16, 18, 23, 25, 27,
    10, 11, 16, 18, 23, 25, 27, 29,
    13, 16, 18, 23, 25, 27, 29, 31,
    16, 18, 23, 25, 27, 31, 33, 36,
    18, 23, 25, 27, 31, 33, 36, 38,
    23, 25, 27, 31, 33, 36, 38, 40,
    25, 27, 31, 33, 36, 38, 40, 42,
    27, 29, 31, 36, 38, 40, 42, 42,
], np.int64)
JVT8P = np.array([
    9, 13, 15, 17, 19, 21, 22, 24,
    13, 13, 17, 19, 21, 22, 24, 25,
    15, 17, 19, 21, 22, 24, 25, 27,
    17, 19, 21, 22, 24, 25, 27, 28,
    19, 21, 22, 24, 25, 27, 28, 30,
    21, 22, 24, 25, 27, 28, 30, 32,
    22, 24, 25, 27, 28, 30, 32, 33,
    24, 25, 27, 28, 30, 32, 33, 35,
], np.int64)


def _pos_class8() -> np.ndarray:
    i = np.arange(64)
    return _QUANT8_SCAN[((i >> 1) & 12) | (i & 3)].reshape(8, 8)


def _shift(x: np.ndarray, s: int) -> np.ndarray:
    if s > 0:
        return (x + (1 << (s - 1))) >> s
    return x << (-s)


def build_tables8(scaling_intra=None, scaling_inter=None,
                  dz_intra: int = 21, dz_inter: int = 11):
    """(quant_mf [52,8,8], bias_intra, bias_inter, dequant_mf [6,8,8]
    x2 lists) for given 8x8 scaling lists (default flat 16). Mirrors
    x264_cqm_init exactly: quant8_mf = DIV(def*16, scale) then
    SHIFT(.., q/6); dequant8_mf = def * scale; bias =
    min(DIV(deadzone<<10, mf), (1<<15)/mf) with deadzones 21 intra /
    11 inter (set.c:76-77 defaults)."""
    cls = _pos_class8()
    sc_i = (FLAT16 if scaling_intra is None
            else np.asarray(scaling_intra, np.int64)).reshape(8, 8)
    sc_p = (FLAT16 if scaling_inter is None
            else np.asarray(scaling_inter, np.int64)).reshape(8, 8)
    out_q = np.zeros((2, 52, 8, 8), np.int64)
    out_bi = np.zeros((2, 52, 8, 8), np.int64)
    out_dq = np.zeros((2, 6, 8, 8), np.int64)
    for li, (sc, dz) in enumerate(((sc_i, dz_intra),
                                   (sc_p, dz_inter))):
        base_q = np.zeros((6, 8, 8), np.int64)
        for q in range(6):
            defq = _QUANT8_SCALE[q][cls]
            defd = _DEQUANT8_SCALE[q][cls]
            base_q[q] = (defq * 16 + sc // 2) // sc
            out_dq[li, q] = defd * sc
        for q in range(52):
            mf = _shift(base_q[q % 6], q // 6)
            out_q[li, q] = mf
            out_bi[li, q] = np.minimum(
                (dz * (1 << 10) + mf // 2) // mf, (1 << 15) // mf)
    return (out_q.astype(np.int64), out_bi.astype(np.int64),
            out_dq.astype(np.int64))


QUANT8_MF, QUANT8_BIAS, DEQUANT8_MF = build_tables8()


def set_scaling8(intra=None, inter=None, dz_intra: int = 21,
                 dz_inter: int = 11) -> None:
    """Install active 8x8 scaling lists (raster order, None = flat)
    + deadzone bias numerators. Callers must clear jit caches
    afterwards (ops/cqm.py does)."""
    global QUANT8_MF, QUANT8_BIAS, DEQUANT8_MF
    QUANT8_MF, QUANT8_BIAS, DEQUANT8_MF = build_tables8(
        intra, inter, dz_intra, dz_inter)

# 8x8 frame zigzag (spec Table 8-9 / classic diagonal scan)


def _zigzag8() -> np.ndarray:
    order = sorted(((y, x) for y in range(8) for x in range(8)),
                   key=lambda p: (p[0] + p[1],
                                  p[1] if (p[0] + p[1]) % 2 == 0
                                  else p[0]))
    return np.array(order, np.int32)


ZIGZAG_8x8 = _zigzag8()


def dct8x8(res: jnp.ndarray) -> jnp.ndarray:
    """Forward 8x8 integer transform of residual blocks [..., 8, 8]
    (dct.c DCT8_1D applied to rows then columns, :236-285)."""
    x = res.astype(jnp.int32)

    def dct1d(s):
        # s: [..., 8] along the last axis
        s0, s1, s2, s3, s4, s5, s6, s7 = [s[..., i] for i in range(8)]
        s07, s16, s25, s34 = s0 + s7, s1 + s6, s2 + s5, s3 + s4
        a0, a1 = s07 + s34, s16 + s25
        a2, a3 = s07 - s34, s16 - s25
        d07, d16, d25, d34 = s0 - s7, s1 - s6, s2 - s5, s3 - s4
        a4 = d16 + d25 + (d07 + (d07 >> 1))
        a5 = d07 - d34 - (d25 + (d25 >> 1))
        a6 = d07 + d34 - (d16 + (d16 >> 1))
        a7 = d16 - d25 + (d34 + (d34 >> 1))
        return jnp.stack([
            a0 + a1, a4 + (a7 >> 2), a2 + (a3 >> 1), a5 + (a6 >> 2),
            a0 - a1, a6 - (a5 >> 2), (a2 >> 1) - a3, (a4 >> 2) - a7,
        ], axis=-1)

    t = dct1d(jnp.swapaxes(x, -1, -2))     # columns (SRC tmp[x][i])
    t = jnp.swapaxes(t, -1, -2)
    # Output orientation: C[r][c] with r = vertical frequency, the
    # H.264 coefficient-matrix convention the (r,c) ZIGZAG_8x8 seam
    # expects. (x264's sub8x8_dct8 instead stores the TRANSPOSE —
    # DST dct[x][i], dct.c:236-285 — and compensates inside its
    # zigzag macro, ZIG(i,y,x) = dct[0][x*8+y], dct.c:491. Keeping
    # the spec orientation here lets every scan read blk[r, c].)
    return dct1d(t)


def idct8x8_add(pred: jnp.ndarray, coef: jnp.ndarray) -> jnp.ndarray:
    """Inverse 8x8 transform + reconstruction (add8x8_idct8,
    dct.c:296-330): dc += 32, rows then columns, >>6, clip to pred."""
    # consumes the spec-orientation C[r][c] produced by dct8x8 (see
    # note there); internally the passes run on the transpose like
    # x264's add8x8_idct8
    x = jnp.swapaxes(coef.astype(jnp.int32), -1, -2)
    x = x.at[..., 0, 0].add(32)

    def idct1d(s):
        s0, s1, s2, s3, s4, s5, s6, s7 = [s[..., i] for i in range(8)]
        a0 = s0 + s4
        a2 = s0 - s4
        a4 = (s2 >> 1) - s6
        a6 = (s6 >> 1) + s2
        b0, b2, b4, b6 = a0 + a6, a2 + a4, a2 - a4, a0 - a6
        a1 = -s3 + s5 - s7 - (s7 >> 1)
        a3 = s1 + s7 - s3 - (s3 >> 1)
        a5 = -s1 + s7 + s5 + (s5 >> 1)
        a7 = s3 + s5 + s1 + (s1 >> 1)
        b1 = (a7 >> 2) + a1
        b3 = a3 + (a5 >> 2)
        b5 = (a3 >> 2) - a5
        b7 = a7 - (a1 >> 2)
        return jnp.stack([
            b0 + b7, b2 + b5, b4 + b3, b6 + b1,
            b6 - b1, b4 - b3, b2 - b5, b0 - b7,
        ], axis=-1)

    t = idct1d(jnp.swapaxes(x, -1, -2))    # SRC dct[x][i]: columns
    t = jnp.swapaxes(t, -1, -2)
    r = idct1d(t)
    r = jnp.swapaxes(r, -1, -2)
    out = pred.astype(jnp.int32) + (r >> 6)
    return jnp.clip(out, 0, 255)


def quant8x8(coef: jnp.ndarray, qp, intra: bool,
             tables=None) -> jnp.ndarray:
    """sign(c) * ((bias + |c|) * mf >> 16) with the 8x8 tables
    (quant.c:42-48). coef: [..., 8, 8]."""
    q_mf, q_bias, _ = tables if tables is not None else (
        QUANT8_MF, QUANT8_BIAS, DEQUANT8_MF)
    li = 0 if intra else 1
    qp = jnp.asarray(qp)
    mf = jnp.asarray(q_mf)[li, qp]
    bias = jnp.asarray(q_bias)[li, qp]
    if qp.ndim == 1 and coef.ndim == 5:
        # per-MB AQ, inter layout [N,2,2,8,8]: [N,8,8] -> [N,1,1,8,8]
        mf = mf[:, None, None]
        bias = bias[:, None, None]
    # per-MB AQ with [W,8,8] blocks (intra wavefront) broadcasts as-is
    mag = ((bias + jnp.abs(coef.astype(jnp.int32)))
           * mf.astype(jnp.int32)) >> 16
    return (jnp.sign(coef) * mag).astype(jnp.int32)


def dequant8x8(level: jnp.ndarray, qp, intra: bool = False,
               tables=None) -> jnp.ndarray:
    """dequant_8x8 (quant.c:111-140): qbits = qp/6 - 6, SHL/SHR with
    rounding f = 1 << (-qbits-1)."""
    _, _, dq_mf = tables if tables is not None else (
        QUANT8_MF, QUANT8_BIAS, DEQUANT8_MF)
    li = 0 if intra else 1
    qp = jnp.asarray(qp)
    dmf = jnp.asarray(dq_mf)[li, qp % 6]
    qbits = qp // 6 - 6
    if qp.ndim == 1 and level.ndim == 5:   # per-MB AQ, inter layout
        dmf = dmf[:, None, None]
        qbits = qbits[:, None, None, None, None]
    elif qp.ndim == 1:                     # [W,8,8] intra wavefront
        qbits = qbits[:, None, None]
    lvl = level.astype(jnp.int32) * dmf.astype(jnp.int32)
    shl = lvl << jnp.maximum(qbits, 0)
    f = 1 << jnp.maximum(-qbits - 1, 0)
    shr = (lvl + f) >> jnp.maximum(-qbits, 0)
    return jnp.where(qbits >= 0, shl, shr).astype(jnp.int32)


# JVT-B118 64-coef decimation run table (reference common/quant.c
# x264_decimate_table8)
DECIMATE_TABLE8 = np.array(
    [3, 3, 3, 3, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1] + [0] * 40, np.int32)


def decimate_score64(lev8: jnp.ndarray) -> jnp.ndarray:
    """x264_decimate_score64 batched: lev8 [..., 8, 8] levels ->
    score [...] (9 when any |coef| > 1)."""
    import jax
    zz = jnp.asarray(ZIGZAG_8x8)
    z = lev8[..., zz[:, 0], zz[:, 1]]                  # [..., 64]
    a = jnp.abs(z)
    anybig = jnp.any(a > 1, axis=-1)
    nz = a > 0
    idx = jnp.arange(64)
    marked = jnp.where(nz, idx, -1)
    prev = jax.lax.cummax(marked, axis=marked.ndim - 1)
    prev_excl = jnp.concatenate(
        [jnp.full_like(prev[..., :1], -1), prev[..., :-1]], axis=-1)
    run = idx - prev_excl - 1
    contrib = jnp.where(nz, jnp.asarray(DECIMATE_TABLE8)[
        jnp.clip(run, 0, 63)], 0)
    return jnp.where(anybig, 9, jnp.sum(contrib, axis=-1))
