"""Pallas analyse-tail kernels: qpel tables, subpel refine and the RCA
probe SATD maps computed in VMEM, block-lane layout.

Reference workload: the per-MV alternative-search of
x264_ih_get_mv_cost (/root/reference/encoder/analyse.c:2391-2550) plus
the subpel refinement sweep (me.c:715).  The XLA formulation
(encoder/partition.py: block_table8 / wht8_flat / subpel_parts /
probe_maps_xla) materializes [169, N8, 64] qpel tables in HBM and pays
XLA's small-trailing-dim padding on every [*, 8, 8] intermediate —
measured ~145 ms/frame at 1080p (docs/PERF.md round 5).  Here the whole
chain runs on chunks of 8x8 blocks held in VMEM:

  layout: every tensor is [rows, B] with BLOCKS IN LANES (z-order, the
  four 8x8s of an MB in adjacent lanes).  The window is [1024, B]
  (rows = phase*256 + y*16 + x); an 8x8 block at a static (y1, x1) is
  eight contiguous [8, B] row slices; 4x4 WHT/DCT become constant
  [64, 64] matmuls on the MXU (entries <= 4, pixels <= 255: products
  and 16-term f32 sums are exact); per-8x8 reductions are row folds;
  the per-MB partition coupling is a lane exchange within groups of 4.

Three kernels (fused later if profitable):
  K1 qpel_tables_pallas : windows -> blocks169/wht169 tables (HBM,
     [169*64, N8] i16 — flat block-lane layout, no 128x padding)
  K2 subpel_pallas      : wht169 + mv costs -> per-block table index
     (bit-exact twin of subpel_parts' argmin for subpel=2)
  K3 probe_maps_pallas  : tables + r_idx -> SK/SP probe SATD maps +
     decimate scores (bit-exact twin of probe_maps_xla)

All are fuzz-tested against the XLA twins (interpret mode on CPU,
tools/bench_probe_kernel.py on silicon).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..encoder import qpel_table as QT

# ---------------------------------------------------------------------------
# Constant matrices (exact in bf16: entries <= 4)
# ---------------------------------------------------------------------------

_H4 = np.array([[1, 1, 1, 1],
                [1, 1, -1, -1],
                [1, -1, -1, 1],
                [1, -1, 1, -1]], np.int32)      # hadamard4x4 row map
_D4 = np.array([[1, 1, 1, 1],
                [2, 1, -1, -2],
                [1, -1, -1, 1],
                [1, -2, 2, -1]], np.int32)      # dct4x4 row map

# row orders used below (per 8x8 block):
#  pix : y*8 + x                      (window/pred/cur pixels)
#  wht : s*16 + 4*vr + vc            (wht8_flat order, s = (y>=4)*2+(x>=4))
#  cfo : (vr*4 + vh)*4 + s           (dct coef order, vr-major)
#  pcf : (y*4 + x)*4 + s             (idct spatial order, sub-minor)


def _sub_of(y, x):
    return (y // 4) * 2 + (x // 4)


def _m_wht_pix() -> np.ndarray:
    """[64(wht), 64(pix)]: wht8_flat of a pix-order 8x8."""
    m = np.zeros((64, 64), np.int32)
    for s in range(4):
        oy, ox = 4 * (s // 2), 4 * (s % 2)
        for vr in range(4):
            for vc in range(4):
                for r in range(4):
                    for c in range(4):
                        m[s * 16 + 4 * vr + vc,
                          (oy + r) * 8 + (ox + c)] = _H4[vr, r] * _H4[vc, c]
    return m


def _m_wht_pcf() -> np.ndarray:
    """[64(wht), 64(pcf)]: wht8_flat of a pcf-order 8x8 (recon)."""
    m = np.zeros((64, 64), np.int32)
    for s in range(4):
        for vr in range(4):
            for vc in range(4):
                for y in range(4):
                    for x in range(4):
                        m[s * 16 + 4 * vr + vc,
                          (y * 4 + x) * 4 + s] = _H4[vr, y] * _H4[vc, x]
    return m


def _m_dct_pix() -> np.ndarray:
    """[64(cfo), 64(pix)]: per-sub 4x4 forward DCT of a pix-order
    residual (transform.dct4x4 exactly: out[vr, vh])."""
    m = np.zeros((64, 64), np.int32)
    for s in range(4):
        oy, ox = 4 * (s // 2), 4 * (s % 2)
        for vr in range(4):
            for vh in range(4):
                for r in range(4):
                    for c in range(4):
                        m[(vr * 4 + vh) * 4 + s,
                          (oy + r) * 8 + (ox + c)] = _D4[vr, r] * _D4[vh, c]
    return m


def _m_pix_to_pcf() -> np.ndarray:
    """[64(pcf), 64(pix)] permutation (pred rows for the idct add)."""
    m = np.zeros((64, 64), np.int32)
    for s in range(4):
        oy, ox = 4 * (s // 2), 4 * (s % 2)
        for y in range(4):
            for x in range(4):
                m[(y * 4 + x) * 4 + s, (oy + y) * 8 + (ox + x)] = 1
    return m


# quant position class per cfo row group (vr,vh), transform.py _pos_class
def _pos_class16() -> np.ndarray:
    i = np.arange(16)
    return ((i & 1) + ((i >> 2) & 1))   # index by 4*vr + vh? see below


# ---------------------------------------------------------------------------
# Shared in-kernel helpers (operate on [rows, B] jnp values)
# ---------------------------------------------------------------------------

_SUBPEL_OFFS = [(oy, ox) for oy in range(-3, 4) for ox in range(-3, 4)]
_ZZ4 = np.array([0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15],
                np.int32)   # zigzag scan k -> 4*r + c (transform.ZIGZAG_4x4)


def _satd_from_diff(d):
    """[64, B] |wht diff| (wht row order) -> [1, B] satd
    (per-sub 16-coef sums >> 1, summed; partition.satd_flat)."""
    tot = None
    for s in range(4):
        t = d[16 * s:16 * s + 8, :] + d[16 * s + 8:16 * s + 16, :]
        t = t[0:4, :] + t[4:8, :]
        t = t[0:2, :] + t[2:4, :]
        t = (t[0:1, :] + t[1:2, :]) >> 1
        tot = t if tot is None else tot + t
    return tot


def _se_bits_wide(v):
    """bits(se(v)) for |v| <= 2048 (me.mv_bits_table formula)."""
    ue = jnp.where(v <= 0, -2 * v, 2 * v - 1)
    u = ue + 1
    n = jnp.zeros_like(v)
    for k in range(1, 13):
        n = n + (u >= (1 << k)).astype(jnp.int32)
    return 1 + 2 * n


def _mask_select(tab_ref, ridx_oy, ridx_ox, t1_ref, a_range, B):
    """Two-stage masked row select from a flat (169*64, B) VMEM table into
    t1_ref (len(a_range)*13, 64, B): t1[(a, xc)] = tab[(oy+a+6)*13+xc]
    masked over the block's subpel row oy (7 possible values)."""
    for ai, a in enumerate(a_range):
        for xc in range(13):
            acc = None
            for oy in range(-3, 4):
                row = (oy + a + 6) * 13 + xc
                if row < 0 or row > 168:
                    continue
                m = (ridx_oy == oy)
                v = jnp.where(
                    m, tab_ref[64 * row:64 * row + 64, :]
                    .astype(jnp.int32), 0)
                acc = v if acc is None else acc + v
            r0 = 64 * (ai * 13 + xc)
            t1_ref[r0:r0 + 64, :] = acc.astype(jnp.int16)


def _stage2_select(t1_ref, ridx_ox, ai, b):
    """sel[(a, b)] = t1[(a, ox+b+6)] masked over ox."""
    acc = None
    for ox in range(-3, 4):
        xc = ox + b + 6
        if xc < 0 or xc > 12:
            continue
        m = (ridx_ox == ox)
        r0 = 64 * (ai * 13 + xc)
        v = jnp.where(m, t1_ref[r0:r0 + 64, :].astype(jnp.int32), 0)
        acc = v if acc is None else acc + v
    return acc


# ---------------------------------------------------------------------------
# K1: qpel block + WHT tables
# ---------------------------------------------------------------------------

def _tables_kernel(w_ref, mwht_ref, blk_ref, wht_ref):
    """w_ref: [1024, B] window (phase*256 + y*16 + x); outputs
    blk_ref/wht_ref: [169, 64, B] (block pix rows / wht rows)."""
    for oy in range(-6, 7):
        for ox in range(-6, 7):
            o = (oy + 6) * 13 + (ox + 6)
            (p1, y1, x1), (p2, y2, x2) = QT._phase_slices(oy, ox)
            rows = []
            for r in range(8):
                a = w_ref[p1 * 256 + (y1 + r) * 16 + x1:
                          p1 * 256 + (y1 + r) * 16 + x1 + 8, :]
                b = w_ref[p2 * 256 + (y2 + r) * 16 + x2:
                          p2 * 256 + (y2 + r) * 16 + x2 + 8, :]
                rows.append(
                    (a.astype(jnp.int32) + b.astype(jnp.int32) + 1) >> 1)
            blk = jnp.concatenate(rows, axis=0)          # [64, B] pix
            blk_ref[64 * o:64 * o + 64, :] = blk.astype(jnp.int16)
            w = jnp.dot(mwht_ref[...], blk.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            wht_ref[64 * o:64 * o + 64, :] = w.astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("interpret", "blk_b"))
def qpel_tables_pallas(w1024: jnp.ndarray, interpret: bool = False,
                       blk_b: int = 128):
    """w1024: [1024, N8] int16 window rows (z-order block lanes,
    N8 % blk_b == 0).  Returns (blocks169, wht169): [169*64, N8] i16."""
    n8 = w1024.shape[1]
    g = n8 // blk_b
    mwht = jnp.asarray(_m_wht_pix(), jnp.bfloat16)
    out_shape = [jax.ShapeDtypeStruct((169 * 64, n8), jnp.int16),
                 jax.ShapeDtypeStruct((169 * 64, n8), jnp.int16)]
    return pl.pallas_call(
        _tables_kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1024, blk_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 64), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((169 * 64, blk_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((169 * 64, blk_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(w1024, mwht)


# ---------------------------------------------------------------------------
# K2: subpel refinement (subpel=2 box, bit-exact twin of subpel_parts)
# ---------------------------------------------------------------------------

def _subpel_kernel(cur_ref, wht_ref, part_ref, mvf_ref, pred_ref,
                   lam_ref, mwht_ref, out_ref, *, interpret: bool):
    """cur_ref: [64, B] pix; wht_ref: [169, 64, B] i16; part_ref: [1,B];
    mvf_ref: [2, B] full-pel mv (x, y); pred_ref: [2, B] qpel predictor;
    out_ref: [1, B] chosen table index r_idx."""
    lam = lam_ref[0]
    cur = cur_ref[...].astype(jnp.bfloat16)
    wcur = jnp.dot(mwht_ref[...], cur,
                   preferred_element_type=jnp.float32).astype(jnp.int32)
    part = part_ref[0:1, :]
    mvfx = mvf_ref[0:1, :]
    mvfy = mvf_ref[1:2, :]
    prx = pred_ref[0:1, :]
    pry = pred_ref[1:2, :]
    B = cur.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
    roll = ((lambda x, k: jnp.roll(x, k, axis=1)) if interpret
            else (lambda x, k: pltpu.roll(x, k % B, axis=1)))

    def swap(x, k):
        return jnp.where((lane & k) != 0, roll(x, k),
                         roll(x, -k))

    best = jnp.full((1, B), jnp.int32(1 << 30))
    ridx = jnp.zeros((1, B), jnp.int32)
    for oy, ox in _SUBPEL_OFFS:
        o = (oy + 6) * 13 + (ox + 6)
        d = jnp.abs(wcur - wht_ref[64 * o:64 * o + 64, :]
                    .astype(jnp.int32))
        sat = _satd_from_diff(d)                         # [1, B]
        p2 = sat + swap(sat, 1)                          # 16x8 pairs
        e2 = sat + swap(sat, 2)                          # 8x16 pairs
        q4 = p2 + swap(p2, 2)                            # 16x16
        sel = jnp.where(part == 0, q4,
                        jnp.where(part == 1, p2,
                                  jnp.where(part == 2, e2, sat)))
        dx = jnp.clip(4 * mvfx + ox - prx, -2048, 2048)
        dy = jnp.clip(4 * mvfy + oy - pry, -2048, 2048)
        mvc = (_se_bits_wide(dx) + _se_bits_wide(dy)) * lam
        cost = sel + mvc
        better = cost < best
        best = jnp.where(better, cost, best)
        ridx = jnp.where(better, jnp.int32(o), ridx)
    out_ref[...] = ridx


@functools.partial(jax.jit, static_argnames=("interpret", "blk_b"))
def subpel_pallas(cur64, wht169, part_l, mvf_l, pred_l, lam,
                  interpret: bool = False, blk_b: int = 128):
    """cur64: [64, N8] i16 pix; wht169: [169*64, N8] i16; part_l:
    [1, N8] i32; mvf_l/pred_l: [2, N8] i32.  Returns r_idx [N8] i32."""
    n8 = cur64.shape[1]
    g = n8 // blk_b
    mwht = jnp.asarray(_m_wht_pix(), jnp.bfloat16)
    lam_a = jnp.asarray(lam, jnp.int32).reshape(1)
    out = pl.pallas_call(
        functools.partial(_subpel_kernel, interpret=interpret),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((64, blk_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((169 * 64, blk_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, blk_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, blk_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((64, 64), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk_b), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n8), jnp.int32),
        interpret=interpret,
    )(cur64, wht169, part_l, mvf_l, pred_l, lam_a, mwht)
    return out[0]


# ---------------------------------------------------------------------------
# K3: probe SATD maps (bit-exact twin of probe_maps_xla)
# ---------------------------------------------------------------------------

# D_MV (dx, dy) candidate deltas, analyse.c:2561-2565 (via stego.cost)
_D_MV = [(0, -1), (1, 0), (0, 1), (-1, 0),
         (-2, 1), (-1, 2), (1, 2), (2, 1),
         (2, -1), (1, -2), (-1, -2), (-2, -1)]
_D_NB = [(0, -1), (1, 0), (0, 1), (-1, 0),
         (-1, -1), (-1, 1), (1, -1), (1, 1), (0, 0)]
# version centers in (dy, dx)
_CENTERS = [(0, 0)] + [(dy, dx) for dx, dy in _D_MV]


def _probe_kernel(cur_ref, blk_ref, wht_ref, roy_ref, rox_ref,
                  mf_ref, bias_ref, dmf_ref, qb_ref,
                  mwhtp_ref, mdct_ref, mperm_ref, mwhtr_ref,
                  sk_ref, sp_ref, sc_ref, t1_ref, sel_ref, *,
                  decimate: bool):
    """Per-chunk probe maps.  cur_ref [64,B] pix i16; blk_ref/wht_ref
    [169,64,B] i16; roy/rox [1,B] i32 subpel offsets (r_idx decomposed);
    SMEM: mf/bias/dmf [16] i32 (position-class resolved per qp),
    qb [3] = (qbits>=0, shl_or_shr, round) packed; outputs sk/sp
    [117,B] i32, sc [13,B] i32; scratch t1 [91,64,B] i16, sel
    [49,64,B] i16."""
    roy = roy_ref[0:1, :]
    rox = rox_ref[0:1, :]
    cur = cur_ref[...].astype(jnp.int32)

    # ---- stage-1/2 masked selects: wht rows for the probe lattice
    _mask_select(wht_ref, roy, rox, t1_ref, range(-3, 4), cur.shape[1])
    for ai, a in enumerate(range(-3, 4)):
        for b in range(-3, 4):
            r0 = 64 * ((a + 3) * 7 + (b + 3))
            sel_ref[r0:r0 + 64, :] = _stage2_select(
                t1_ref, rox, ai, b).astype(jnp.int16)

    # ---- stage-1 masked selects for the 13 pred-block versions
    _mask_select(blk_ref, roy, rox, t1_ref, range(-2, 3), cur.shape[1])

    qb_pos = qb_ref[0]
    qb_sh = qb_ref[1]
    qb_f = qb_ref[2]

    for v in range(13):
        dy, dx = _CENTERS[v]
        # pred block of this version, [64, B] pix
        pred = _stage2_select(t1_ref, rox, dy + 2, dx)
        pred_bf = pred.astype(jnp.bfloat16)
        # DCT of the residual: exact constant matmul (|res| <= 255)
        res = (cur - pred).astype(jnp.bfloat16)
        coef = jnp.dot(mdct_ref[...], res,
                       preferred_element_type=jnp.float32) \
            .astype(jnp.int32)                            # [64,B] cfo
        # quant (transform.quant4x4, inter): rows (vr*4+vh)*4+s
        lev_rows = []
        for g16 in range(16):
            c = coef[4 * g16:4 * g16 + 4, :]
            mag = ((bias_ref[g16] + jnp.abs(c)) * mf_ref[g16]) >> 16
            lev_rows.append(jnp.sign(c) * mag)
        lev = jnp.concatenate(lev_rows, axis=0)           # [64,B] cfo
        # decimate score per 4x4 sub -> per-8x8 sum (inter.decimate_score)
        if decimate:
            run = jnp.zeros((4, lev.shape[1]), jnp.int32)
            score = jnp.zeros((4, lev.shape[1]), jnp.int32)
            anybig = jnp.zeros((4, lev.shape[1]), jnp.bool_)
            for k in range(16):
                g16 = int(_ZZ4[k])
                a = jnp.abs(lev[4 * g16:4 * g16 + 4, :])
                nz = a > 0
                anybig = anybig | (a > 1)
                contrib = ((run < 1).astype(jnp.int32)
                           + (run < 3).astype(jnp.int32)
                           + (run < 6).astype(jnp.int32))
                score = score + jnp.where(nz, contrib, 0)
                run = jnp.where(nz, 0, run + 1)
            score = jnp.where(anybig, 9, score)           # [4,B] per 4x4
            sc8 = (score[0:1, :] + score[1:2, :]
                   + score[2:3, :] + score[3:4, :])
            sc_ref[v:v + 1, :] = sc8
        # dequant (transform.dequant4x4, branchless both-ways shift)
        deq_rows = []
        for g16 in range(16):
            d = lev[4 * g16:4 * g16 + 4, :] * dmf_ref[g16]
            deq_rows.append(jnp.where(qb_pos != 0, d << qb_sh,
                                      (d + qb_f) >> qb_sh))
        # idct pass 1: along vh (within each vr group: rows vh*4+s)
        pcf_rows = [None] * 64
        t_rows = [None] * 64
        for vr in range(4):
            base = 16 * vr
            x0 = deq_rows[4 * vr + 0]
            x1 = deq_rows[4 * vr + 1]
            x2 = deq_rows[4 * vr + 2]
            x3 = deq_rows[4 * vr + 3]
            s02, d02 = x0 + x2, x0 - x2
            s13 = x1 + (x3 >> 1)
            d13 = (x1 >> 1) - x3
            t_rows[4 * vr + 0] = s02 + s13
            t_rows[4 * vr + 1] = d02 + d13
            t_rows[4 * vr + 2] = d02 - d13
            t_rows[4 * vr + 3] = s02 - s13
        # idct pass 2: along vr (groups (vr, x): t_rows[4*vr + x])
        for x in range(4):
            x0 = t_rows[0 + x]
            x1 = t_rows[4 + x]
            x2 = t_rows[8 + x]
            x3 = t_rows[12 + x]
            s02, d02 = x0 + x2, x0 - x2
            s13 = x1 + (x3 >> 1)
            d13 = (x1 >> 1) - x3
            for y, val in ((0, s02 + s13), (1, d02 + d13),
                           (2, d02 - d13), (3, s02 - s13)):
                pcf_rows[(y * 4 + x)] = (val + 32) >> 6   # [4,B] subs
        resid = jnp.concatenate([pcf_rows[i] for i in range(16)],
                                axis=0)                   # [64,B] pcf
        pred_pcf = jnp.dot(mperm_ref[...], pred_bf,
                           preferred_element_type=jnp.float32) \
            .astype(jnp.int32)
        rec = jnp.clip(pred_pcf + resid, 0, 255)
        wk = jnp.dot(mwhtr_ref[...], rec.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32) \
            .astype(jnp.int32)                            # [64,B] wht
        wp = jnp.dot(mwhtp_ref[...], pred_bf,
                     preferred_element_type=jnp.float32) \
            .astype(jnp.int32)
        # 9-point probe SATDs vs the selected lattice rows
        for k in range(9):
            ndx, ndy = _D_NB[k]
            a = dy + ndy + 3
            b = dx + ndx + 3
            r0 = 64 * (a * 7 + b)
            selw = sel_ref[r0:r0 + 64, :].astype(jnp.int32)
            skv = _satd_from_diff(jnp.abs(wk - selw))
            sk_ref[v * 9 + k:v * 9 + k + 1, :] = skv
            if decimate:
                sp_ref[v * 9 + k:v * 9 + k + 1, :] = _satd_from_diff(
                    jnp.abs(wp - selw))
            else:
                sp_ref[v * 9 + k:v * 9 + k + 1, :] = skv
    if not decimate:
        sc_ref[...] = jnp.zeros((13, cur.shape[1]), jnp.int32)


@functools.partial(jax.jit, static_argnames=("decimate", "interpret",
                                             "blk_b"))
def probe_maps_pallas(cur64, blocks169, wht169, r_idx, qp,
                      decimate: bool = True, interpret: bool = False,
                      blk_b: int = 128):
    """cur64: [64, N8] i16 pix (z-order lanes); blocks169/wht169:
    [169*64, N8] i16; r_idx: [N8] i32 table index; qp traced scalar.
    Returns (SK [117, N8], SP [117, N8], sc8 [13, N8]) i32."""
    from ..ops import transform as T

    n8 = cur64.shape[1]
    g = n8 // blk_b
    qp = jnp.asarray(qp)
    # position-class tables in cfo group order g16 = vr*4+vh
    mf44 = jnp.asarray(T.QUANT4_MF_P)[qp]                 # [4,4] vr,vh
    bias44 = jnp.asarray(T.QUANT4_BIAS_INTER)[qp]
    dmf44 = jnp.asarray(T.DEQUANT4_MF_P)[qp % 6]
    mf = mf44.reshape(16).astype(jnp.int32)
    bias = bias44.reshape(16).astype(jnp.int32)
    dmf = dmf44.reshape(16).astype(jnp.int32)
    qbits = qp // 6 - 4
    qb = jnp.stack([(qbits >= 0).astype(jnp.int32),
                    jnp.where(qbits >= 0, qbits, -qbits).astype(jnp.int32),
                    jnp.where(qbits >= 0, 0,
                              1 << jnp.maximum(-qbits - 1, 0))
                    .astype(jnp.int32)])
    roy = (r_idx // 13 - 6).reshape(1, n8)
    rox = (r_idx % 13 - 6).reshape(1, n8)

    mwhtp = jnp.asarray(_m_wht_pix(), jnp.bfloat16)
    mdct = jnp.asarray(_m_dct_pix(), jnp.bfloat16)
    mperm = jnp.asarray(_m_pix_to_pcf(), jnp.bfloat16)
    mwhtr = jnp.asarray(_m_wht_pcf(), jnp.bfloat16)

    kern = functools.partial(_probe_kernel, decimate=decimate)
    outs = pl.pallas_call(
        kern,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((64, blk_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((169 * 64, blk_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((169 * 64, blk_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((64, 64), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 64), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 64), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 64), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((117, blk_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((117, blk_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((13, blk_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((117, n8), jnp.int32),
                   jax.ShapeDtypeStruct((117, n8), jnp.int32),
                   jax.ShapeDtypeStruct((13, n8), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((91 * 64, blk_b), jnp.int16),
                        pltpu.VMEM((49 * 64, blk_b), jnp.int16)],
        interpret=interpret,
    )(cur64, blocks169, wht169, roy, rox, mf, bias, dmf, qb,
      mwhtp, mdct, mperm, mwhtr)
    return outs


# ---------------------------------------------------------------------------
# Orchestrator: windows -> (mv8, r_idx8, SK, SP, sc8)
# ---------------------------------------------------------------------------

def _z_lane_order(mbh, mbw):
    """Spatial [2mbh*2mbw] -> z-order lane permutation indices."""
    q = np.arange(2 * mbh)[:, None]
    b = np.arange(2 * mbw)[None, :]
    mbrow, zr = q // 2, q % 2
    mbcol, zc = b // 2, b % 2
    lane = 4 * (mbrow * mbw + mbcol) + 2 * zr + zc
    return lane.reshape(-1)                       # spatial idx -> z lane


def analyse_tail_pallas(cur_y, windows_sp, part, mvfp8, prev_mv, lam,
                        qp, mbh: int, mbw: int, decimate: bool = True,
                        interpret: bool = False):
    """Pallas analyse tail: subpel + probe maps from per-block windows.

    cur_y: [16mbh, 16mbw]; windows_sp: [N8, 4, 16, 16] (spatial order,
    gather_windows8 layout); part: [mbh, mbw]; mvfp8: [2mbh, 2mbw, 2]
    full-pel; prev_mv: [mbh, mbw, 2] qpel predictor.
    Returns (mv8 [2mbh,2mbw,2] qpel, r_idx8 [N8] spatial,
    SK [13,9,n,4], SP, sc8 [13,n,4]) — bit-exact twins of
    subpel_parts + probe_maps_xla for subpel=2."""
    n = mbh * mbw
    n8 = 4 * n
    # lanes padded to a 128 multiple (Mosaic lane-block divisibility)
    pad = (-n8) % 128
    blk_b = 128

    def sp_to_z_rows(a):
        """[2mbh*2mbw, ...] spatial row-major -> [n8, ...] z-order,
        pure reshape/transpose (no gathers)."""
        rest = a.shape[1:]
        return a.reshape(mbh, 2, mbw, 2, *rest) \
            .transpose(0, 2, 1, 3, *range(4, 4 + len(rest))) \
            .reshape(n8, *rest)

    # [N8sp, 4, 16, 16] -> [1024, N8z]
    wz = sp_to_z_rows(windows_sp.reshape(n8, 1024))
    w1024 = wz.T.astype(jnp.int16)

    cur8 = cur_y.reshape(2 * mbh, 8, 2 * mbw, 8).transpose(0, 2, 1, 3) \
        .reshape(n8, 64)                           # spatial, pix rows
    cur64 = sp_to_z_rows(cur8).T.astype(jnp.int16)

    partz = jnp.repeat(part.reshape(n), 4).reshape(1, n8)
    mvfz = sp_to_z_rows(mvfp8.reshape(n8, 2)).T    # [2, N8z] (x, y)
    predz = sp_to_z_rows(
        jnp.repeat(jnp.repeat(prev_mv, 2, 0), 2, 1).reshape(n8, 2)).T

    if pad:
        w1024 = jnp.pad(w1024, ((0, 0), (0, pad)))
        cur64 = jnp.pad(cur64, ((0, 0), (0, pad)))
        partz = jnp.pad(partz, ((0, 0), (0, pad)))
        mvfz = jnp.pad(mvfz, ((0, 0), (0, pad)))
        predz = jnp.pad(predz, ((0, 0), (0, pad)))

    blocks169, wht169 = qpel_tables_pallas(w1024, interpret=interpret,
                                           blk_b=blk_b)
    ridx_z = subpel_pallas(cur64, wht169, partz.astype(jnp.int32),
                           mvfz.astype(jnp.int32),
                           predz.astype(jnp.int32), lam,
                           interpret=interpret, blk_b=blk_b)
    SKf, SPf, scf = probe_maps_pallas(cur64, blocks169, wht169, ridx_z,
                                      qp, decimate=decimate,
                                      interpret=interpret, blk_b=blk_b)
    ridx_z = ridx_z[:n8]
    SK = SKf[:, :n8].reshape(13, 9, n, 4)
    SP = SPf[:, :n8].reshape(13, 9, n, 4)
    sc8 = scf[:, :n8].reshape(13, n, 4)

    # mv8 / r_idx8 exactly as subpel_parts derives them
    def z_to_sp_rows(a):
        rest = a.shape[1:]
        return a.reshape(mbh, mbw, 2, 2, *rest) \
            .transpose(0, 2, 1, 3, *range(4, 4 + len(rest))) \
            .reshape(n8, *rest)

    oy = ridx_z // 13 - 6
    ox = ridx_z % 13 - 6
    mvz = sp_to_z_rows(mvfp8.reshape(n8, 2))       # [N8z, 2] full-pel
    mvq = jnp.stack([4 * mvz[:, 0] + ox, 4 * mvz[:, 1] + oy], axis=-1)
    mv8 = z_to_sp_rows(mvq).reshape(2 * mbh, 2 * mbw, 2)
    r_idx8 = z_to_sp_rows(ridx_z[:, None])[:, 0]   # spatial order
    return mv8, r_idx8, SK, SP, sc8
