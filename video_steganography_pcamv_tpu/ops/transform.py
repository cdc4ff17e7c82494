"""H.264 integer transforms + quantization, whole-frame batched.

Re-expresses the reference's scalar per-block loops as elementwise ops on
coefficient planes (see ops/blocks.py):

- 4x4 core transform / inverse   (reference: common/dct.c:122-200)
- 4x4 DC Hadamard (i16x16 luma)  (common/dct.c:40-105)
- 2x2 chroma DC                  (encoder/macroblock.c:72-86)
- quant / dequant, incl. DC paths (common/quant.c:34-180,
  tables from common/set.c:28-150)
- zigzag scan order               (common/dct.c:540-560)

All arithmetic is exact int32; the dequant+IDCT pipeline is the H.264
normative reconstruction, so any conforming decoder agrees bit-exactly.

Quant/dequant tables are derived from the public H.264 M/V scale constants
(spec tables 8-x; also common/set.c:21-44) with flat scaling matrices.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Tables (flat CQM). Derived at import time, mirroring x264_cqm_init
# (/root/reference/common/set.c:68-151) with scaling_list == 16 (flat).
# ---------------------------------------------------------------------------

_DEQUANT4_SCALE = np.array([  # V, spec 8-315 column order (0,0),(1,1),other
    [10, 13, 16],
    [11, 14, 18],
    [13, 16, 20],
    [14, 18, 23],
    [16, 20, 25],
    [18, 23, 29],
], dtype=np.int64)

_QUANT4_SCALE = np.array([  # M
    [13107, 8066, 5243],
    [11916, 7490, 4660],
    [10082, 6554, 4194],
    [9362, 5825, 3647],
    [8192, 5243, 3355],
    [7282, 4559, 2893],
], dtype=np.int64)


def _pos_class() -> np.ndarray:
    # position class j = (i&1) + ((i>>2)&1) over raster i (set.c:114)
    i = np.arange(16)
    return ((i & 1) + ((i >> 2) & 1)).reshape(4, 4)


def _shift(x: np.ndarray, s: int) -> np.ndarray:
    if s > 0:
        return (x + (1 << (s - 1))) >> s
    return x << (-s)


def _build_tables(scaling=None, deadzone_intra: int = 21,
                  deadzone_inter: int = 11):
    """4x4 quant/dequant tables for one scaling list (x264_cqm_init,
    set.c:130-151: quant_mf = DIV(def*16, scale), dequant_mf =
    def*scale; flat scale 16 reproduces the classic tables exactly).
    scaling: [16] raster-order list (None = flat 16)."""
    cls = _pos_class()
    def_quant = _QUANT4_SCALE[:, cls]      # [6,4,4]
    def_dequant = _DEQUANT4_SCALE[:, cls]  # [6,4,4]
    sc = (np.full((4, 4), 16, np.int64) if scaling is None
          else np.asarray(scaling, np.int64).reshape(4, 4))

    quant_mf = np.zeros((52, 4, 4), dtype=np.int64)
    bias_intra = np.zeros((52, 4, 4), dtype=np.int64)
    bias_inter = np.zeros((52, 4, 4), dtype=np.int64)
    # deadzones: intra 21/64, inter 11/64 (set.c:76 with default deadzones)
    base = (def_quant * 16 + sc // 2) // sc          # [6,4,4] DIV
    for q in range(52):
        mf = _shift(base[q % 6], q // 6 - 1)
        quant_mf[q] = mf
        for dz, out in ((deadzone_intra, bias_intra),
                        (deadzone_inter, bias_inter)):
            out[q] = np.minimum((dz * (1 << 10) + mf // 2) // mf,
                                (1 << 15) // mf)
    dequant_mf = def_dequant * sc  # [6,4,4] (set.c:132)
    return (quant_mf.astype(np.int32), bias_intra.astype(np.int32),
            bias_inter.astype(np.int32), dequant_mf.astype(np.int32))


QUANT4_MF, QUANT4_BIAS_INTRA, QUANT4_BIAS_INTER, DEQUANT4_MF = _build_tables()
# per-class tables (CQM: intra and inter lists may differ; flat default
# aliases the classic shared tables)
QUANT4_MF_I, QUANT4_MF_P = QUANT4_MF, QUANT4_MF
DEQUANT4_MF_I, DEQUANT4_MF_P = DEQUANT4_MF, DEQUANT4_MF


def set_scaling4(intra=None, inter=None, dz_intra: int = 21,
                 dz_inter: int = 11) -> None:
    """Install active 4x4 scaling lists (raster order, None = flat)
    and luma deadzone bias numerators (x264 set.c:76: numerator =
    32 - i_luma_deadzone, defaults 21 intra / 11 inter). Callers must
    clear jit caches afterwards (ops/cqm.py does)."""
    global QUANT4_MF_I, QUANT4_MF_P, QUANT4_BIAS_INTRA
    global QUANT4_BIAS_INTER, DEQUANT4_MF_I, DEQUANT4_MF_P
    QUANT4_MF_I, QUANT4_BIAS_INTRA, _, DEQUANT4_MF_I = \
        _build_tables(intra, deadzone_intra=dz_intra)
    QUANT4_MF_P, _, QUANT4_BIAS_INTER, DEQUANT4_MF_P = \
        _build_tables(inter, deadzone_inter=dz_inter)

# chroma QP mapping (spec table 8-15)
CHROMA_QP_TABLE = np.concatenate([
    np.arange(30),
    np.array([29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37,
              38, 38, 38, 39, 39, 39, 39]),
]).astype(np.int32)


def chroma_qp(qp: int, offset: int = 0) -> int:
    return int(CHROMA_QP_TABLE[min(51, max(0, qp + offset))])


# zigzag scan for 4x4 frame blocks: scan index -> (row, col)
ZIGZAG_4x4 = np.array([
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (3, 1), (2, 2), (1, 3), (2, 3), (3, 2), (3, 3),
], dtype=np.int32)


# ---------------------------------------------------------------------------
# Transforms. x shaped [..., 4, 4, BY, BX] (coefficient planes); int32.
# ---------------------------------------------------------------------------

def _fwd_butterfly(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """One pass of the H.264 forward core transform along `axis`
    (common/dct.c:129-140)."""
    x0, x1, x2, x3 = [jnp.take(x, i, axis=axis) for i in range(4)]
    s03, s12 = x0 + x3, x1 + x2
    d03, d12 = x0 - x3, x1 - x2
    return jnp.stack([s03 + s12, 2 * d03 + d12, s03 - s12, d03 - 2 * d12],
                     axis=axis)


def _inv_butterfly(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """One pass of the inverse core transform (common/dct.c:180-196).
    Uses arithmetic shifts (>>1) on int32."""
    x0, x1, x2, x3 = [jnp.take(x, i, axis=axis) for i in range(4)]
    s02, d02 = x0 + x2, x0 - x2
    s13 = x1 + (x3 >> 1)
    d13 = (x1 >> 1) - x3
    return jnp.stack([s02 + s13, d02 + d13, d02 - d13, s02 - s13], axis=axis)


def dct4x4(residual_planes: jnp.ndarray) -> jnp.ndarray:
    """Forward 4x4 core transform. In/out: [..., 4(r), 4(c), BY, BX] int32.
    Output indexed [vfreq, hfreq] (natural orientation; the reference stores
    the transpose, common/dct.c:122 — equivalent under its zigzag)."""
    t = _fwd_butterfly(residual_planes, -3)  # rows: transform along c
    return _fwd_butterfly(t, -4)             # cols: transform along r


def idct4x4(coef_planes: jnp.ndarray) -> jnp.ndarray:
    """Inverse 4x4 transform *without* the final rounding; returns the
    pre-shift sum. Callers add 32 and >>6 then add prediction
    (common/dct.c:174-205)."""
    t = _inv_butterfly(coef_planes, -3)
    return _inv_butterfly(t, -4)


def idct4x4_add(pred_planes: jnp.ndarray, coef_planes: jnp.ndarray):
    """pred + clip((idct + 32) >> 6), uint8 semantics in int32."""
    r = (idct4x4(coef_planes) + 32) >> 6
    return jnp.clip(pred_planes + r, 0, 255)


def hadamard4x4(x: jnp.ndarray, final_shift: bool = False) -> jnp.ndarray:
    """4x4 Walsh-Hadamard on [..., 4, 4, Y, X] (axes -4, -3).

    With final_shift=True this is the forward luma-DC transform including
    its (x+1)>>1 (common/dct.c:40-70); without it, the inverse idct4x4dc
    (common/dct.c:73-105)."""
    def bf(v, axis):
        v0, v1, v2, v3 = [jnp.take(v, i, axis=axis) for i in range(4)]
        s01, d01 = v0 + v1, v0 - v1
        s23, d23 = v2 + v3, v2 - v3
        return jnp.stack([s01 + s23, s01 - s23, d01 - d23, d01 + d23],
                         axis=axis)
    out = bf(bf(x, -3), -4)
    if final_shift:
        out = (out + 1) >> 1
    return out


# ---------------------------------------------------------------------------
# Quant / dequant
# ---------------------------------------------------------------------------

def _qtables(qp, intra: bool):
    qp = jnp.asarray(qp)
    mf = jnp.asarray(QUANT4_MF_I if intra else QUANT4_MF_P)[qp]
    bias = jnp.asarray(QUANT4_BIAS_INTRA if intra else QUANT4_BIAS_INTER)[qp]
    return mf, bias


def quant4x4(coef: jnp.ndarray, qp, intra: bool) -> jnp.ndarray:
    """sign(c) * ((bias + |c|) * mf >> 16)  (common/quant.c:34-57).
    coef: [..., 4, 4, BY, BX]; qp: scalar or broadcastable [..., BY, BX]."""
    mf, bias = _qtables(qp, intra)
    if mf.ndim == 2:  # scalar qp: [4,4] -> [4,4,1,1] to broadcast on planes
        mf = mf[:, :, None, None]
        bias = bias[:, :, None, None]
    else:  # per-block qp: [..., BY, BX, 4, 4] -> [..., 4, 4, BY, BX]
        mf = jnp.moveaxis(mf, (-2, -1), (-4, -3))
        bias = jnp.moveaxis(bias, (-2, -1), (-4, -3))
    mag = (bias + jnp.abs(coef)) * mf >> 16
    return jnp.sign(coef) * mag


def dequant4x4(level: jnp.ndarray, qp, intra: bool = False) -> jnp.ndarray:
    """Normative AC dequant (common/quant.c:82-110): dmf = V*scale
    (flat: V*16), qbits = qp/6 - 4. intra selects the scaling list."""
    qp = jnp.asarray(qp)
    dmf = jnp.asarray(DEQUANT4_MF_I if intra else DEQUANT4_MF_P)[qp % 6]
    qbits = qp // 6 - 4
    if dmf.ndim == 2:
        dmf = dmf[:, :, None, None]
    else:
        dmf = jnp.moveaxis(dmf, (-2, -1), (-4, -3))
        qbits = qbits[..., None, None]   # align with [..,4,4,BY,BX]
    # branchless both-ways shift, exact for flat CQM (dmf multiple of 16)
    shl = (level * dmf) << jnp.maximum(qbits, 0)
    f = 1 << jnp.maximum(-qbits - 1, 0)
    shr = (level * dmf + f) >> jnp.maximum(-qbits, 0)
    return jnp.where(qbits >= 0, shl, shr)


def quant_dc(coef: jnp.ndarray, qp, intra: bool) -> jnp.ndarray:
    """DC quant: mf[0]>>1, bias[0]<<1 (encoder/macroblock.c:252,340).
    qp may be a traced scalar (per-frame rate control without recompile)."""
    qp = jnp.asarray(qp)
    mf = jnp.asarray(QUANT4_MF_I if intra
                     else QUANT4_MF_P)[qp, 0, 0] >> 1
    bias_t = QUANT4_BIAS_INTRA if intra else QUANT4_BIAS_INTER
    bias = jnp.asarray(bias_t)[qp, 0, 0] << 1
    mag = (bias + jnp.abs(coef)) * mf >> 16
    return jnp.sign(coef) * mag


def dequant_dc_luma(dc: jnp.ndarray, qp) -> jnp.ndarray:
    """dequant_4x4_dc (common/quant.c:148-178): qbits = qp/6 - 6, applied
    after the inverse Hadamard. Branchless both-ways shift so qp can be
    traced. i16 DC is always intra."""
    qp = jnp.asarray(qp)
    dmf = jnp.asarray(DEQUANT4_MF_I)[qp % 6, 0, 0]
    qbits = qp // 6 - 6
    shl = (dc * dmf) << jnp.maximum(qbits, 0)
    f = 1 << jnp.maximum(-qbits - 1, 0)
    shr = (dc * dmf + f) >> jnp.maximum(-qbits, 0)
    return jnp.where(qbits >= 0, shl, shr)


def hadamard2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 Hadamard H·X·H (its own inverse up to scale 4) for chroma DC
    (encoder/macroblock.c:72-86). x: [..., 2, 2, Y, X], natural orientation:
    out[0,1] carries the horizontal difference (spec chroma-DC scan order)."""
    a, b = x[..., 0, 0, :, :], x[..., 0, 1, :, :]
    c, d = x[..., 1, 0, :, :], x[..., 1, 1, :, :]
    o00 = a + b + c + d
    o01 = a - b + c - d
    o10 = a + b - c - d
    o11 = a - b - c + d
    return jnp.stack([jnp.stack([o00, o01], axis=-3),
                      jnp.stack([o10, o11], axis=-3)], axis=-4)


def dequant_dc_chroma(dc: jnp.ndarray, qp,
                      intra: bool = False) -> jnp.ndarray:
    """idct_dequant_2x2 scale part (encoder/macroblock.c:40-60):
    after the 2x2 Hadamard combine, scale by dmf with qbits = qp/6 - 5.
    Branchless so qp can be traced (no rounding term in the reference)."""
    qp = jnp.asarray(qp)
    dmf = jnp.asarray(DEQUANT4_MF_I if intra
                      else DEQUANT4_MF_P)[qp % 6, 0, 0]
    qbits = qp // 6 - 5
    shl = (dc * dmf) << jnp.maximum(qbits, 0)
    shr = (dc * dmf) >> jnp.maximum(-qbits, 0)
    return jnp.where(qbits > 0, shl, shr)
