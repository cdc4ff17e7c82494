"""B-slice analysis, encode and host scan.

Reference: the B path of x264_macroblock_analyse (analyse.c:3110-3466:
direct + L0/L1/BI 16x16 analysis, bidir SATD refine me.c:914-997),
spatial direct derivation (common/macroblock.c x264_mb_predict_mv_direct
spatial path), and the B mb_type syntax (spec 7.4.5 / 9.3.2.5).

TPU redesign: L0 and L1 motion searches are two runs of the exhaustive
table pipeline; the BI cost is evaluated exactly at (bestL0, bestL1)
like x264's bidir refine; spatial-direct MV derivation is the host
raster scan (serial by the spec's neighbour dependences), with the
direct SAD pre-evaluated on device at the approximate (inter-field)
direct MVs — decisions are approximate where neighbours changed mode,
the committed direct MVs are always the exact decoder derivation.

Scope (documented): B MBs are 16x16-granularity (DIRECT / L0 / L1 / BI
+ B_SKIP); B partitions and intra-in-B are not analysed. B frames are
non-references (no B-pyramid) and deblocking is disabled on B slices
via the slice header (a legal encoder choice; B recon drift is
impossible since nothing references it).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import mc
from ..ops import transform as T
from ..ops.blocks import to_blocks
from . import qpel_table as QT
from .me import mv_bits_table
from .scan import _Grid, unit_mvp, D_16x16
from .inter import (_zigzag_gather, decimate_score, _mb_tiles16)

# B mb_type ue() codes for the 16x16 subset (spec 7.4.5 table)
B_DIRECT, B_L0, B_L1, B_BI = 0, 1, 2, 3
# ue sizes of the mb_type codes (+1 bit per mvd pair is in the mv cost)
_B_HDR_BITS = np.array([1, 3, 3, 5], np.int32)


def _subpel_cost(cur_y, wht169, mv_fp, prev_mv, mbh, mbw, lam, subpel):
    """subpel_from_table twin that also returns the winning cost and
    offset index."""
    n = mbh * mbw
    wcur = QT.wht16(_mb_tiles16(cur_y, mbh, mbw))
    mvfp_f = mv_fp.reshape(n, 2)
    pred = prev_mv.reshape(n, 2)
    bits_t = jnp.asarray(mv_bits_table(4 * 512))
    off = 4 * 512
    if subpel == 0:
        offsets = [(0, 0)]
    elif subpel == 1:
        offsets = [(oy, ox) for oy in (-2, 0, 2) for ox in (-2, 0, 2)]
    else:
        offsets = [(oy, ox) for oy in range(-3, 4) for ox in range(-3, 4)]
    costs = []
    for oy, ox in offsets:
        idx = QT.off_index(oy, ox)
        sat = QT.satd_tables(wcur, wht169[idx])
        qx = 4 * mvfp_f[:, 0] + ox
        qy = 4 * mvfp_f[:, 1] + oy
        mvc = (bits_t[jnp.clip(qx - pred[:, 0], -off, off) + off]
               + bits_t[jnp.clip(qy - pred[:, 1], -off, off) + off]) * lam
        costs.append(sat + mvc)
    costs = jnp.stack(costs)
    sel = jnp.argmin(costs, axis=0)
    best = jnp.min(costs, axis=0)
    offs = jnp.asarray(np.array(offsets, np.int32))
    oy_sel = offs[sel, 0]
    ox_sel = offs[sel, 1]
    mv = jnp.stack([4 * mvfp_f[:, 0] + ox_sel,
                    4 * mvfp_f[:, 1] + oy_sel], axis=-1)
    r_idx = (oy_sel + 6) * 13 + (ox_sel + 6)
    return mv.reshape(mbh, mbw, 2), r_idx, best.reshape(mbh, mbw)


@functools.partial(jax.jit, static_argnames=("rng", "mbh", "mbw",
                                             "subpel", "use_pallas"))
def analyse_b_frame(y, ref0_luma, ref1_luma, rng: int, mbh: int,
                    mbw: int, lam, subpel: int, use_pallas: bool):
    """Fused B analysis: per-list exhaustive ME + subpel, BI cost at
    (bestL0, bestL1). Returns (mv0, c0, mv1, c1, cbi) — mvs qpel
    [mbh,mbw,2], costs [mbh,mbw] SATD + lambda*mvbits."""
    from . import me as ME
    n = mbh * mbw
    outs = []
    for ref_luma in (ref0_luma, ref1_luma):
        if use_pallas:
            from ..ops.pallas_kernels import fullpel_search_pallas
            mv_fp, _ = fullpel_search_pallas.__wrapped__(
                y, ref_luma[0], rng, mbh, mbw, lam)
        else:
            zero_pred = jnp.zeros((mbh, mbw, 2), jnp.int32)
            mv_fp, _ = ME.fullpel_search.__wrapped__(
                y, ref_luma[0], zero_pred, rng, mbh, mbw, lam)
        windows = QT.gather_windows_jnp(
            ref_luma.astype(jnp.uint8), mv_fp, mbh, mbw).astype(jnp.int32)
        blocks = QT.block_table(windows)
        wht = QT.wht16(blocks)
        zero = jnp.zeros((mbh, mbw, 2), jnp.int32)
        mv_q, r_idx, cost = _subpel_cost(y, wht, mv_fp, zero,
                                         mbh, mbw, lam, subpel)
        blk = QT.select_rows(blocks, r_idx)            # [N,16,16]
        outs.append((mv_q, cost, blk))
    (mv0, c0, blk0), (mv1, c1, blk1) = outs
    cur = _mb_tiles16(y, mbh, mbw)
    bi = (blk0 + blk1 + 1) >> 1
    satd_bi = QT.satd_tables(QT.wht16(cur), QT.wht16(bi))
    # BI pays both mv costs: approximate as (c0-satd0)+(c1-satd1) is
    # not recoverable here; use bits of both mvs against zero pred
    bits_t = jnp.asarray(mv_bits_table(4 * 512))
    off = 4 * 512
    mvc = jnp.zeros(n, jnp.int32)
    for mv in (mv0, mv1):
        f = mv.reshape(n, 2)
        mvc = mvc + (bits_t[jnp.clip(f[:, 0], -off, off) + off]
                     + bits_t[jnp.clip(f[:, 1], -off, off) + off]) * lam
    cbi = satd_bi.reshape(mbh, mbw) + mvc.reshape(mbh, mbw)
    return mv0, c0, mv1, c1, cbi


def _assemble_pred_b(ref0, ref1, use0, use1, mv0_8, mv1_8,
                     mbh: int, mbw: int):
    """Bipred luma+chroma assembly per 8x8 block. ref0/ref1: dicts with
    'luma' [4,Hp,Wp], 'u', 'v'. use0/use1: [2mbh,2mbw] int32.
    Returns (pred_y [n,16,16], pred_u [n,8,8], pred_v [n,8,8])."""
    n = mbh * mbw
    n8 = 4 * n
    ys8 = (jnp.arange(n8) // (2 * mbw)) * 8
    xs8 = (jnp.arange(n8) % (2 * mbw)) * 8
    u0 = use0.reshape(n8)[:, None, None]
    u1 = use1.reshape(n8)[:, None, None]
    p0 = mc.mc_luma(ref0["luma"], ys8, xs8, mv0_8.reshape(n8, 2),
                    bh=8, bw=8)
    p1 = mc.mc_luma(ref1["luma"], ys8, xs8, mv1_8.reshape(n8, 2),
                    bh=8, bw=8)
    p8 = jnp.where(u0 & u1, (p0 + p1 + 1) >> 1,
                   jnp.where(u0, p0, p1))
    pred = p8.reshape(2 * mbh, 2 * mbw, 8, 8).transpose(0, 2, 1, 3) \
             .reshape(16 * mbh, 16 * mbw)
    pred_y = pred.reshape(mbh, 16, mbw, 16).transpose(0, 2, 1, 3) \
                 .reshape(n, 16, 16)

    ysc = (jnp.arange(n8) // (2 * mbw)) * 4
    xsc = (jnp.arange(n8) % (2 * mbw)) * 4
    preds_c = []
    for pl in ("u", "v"):
        c0 = mc.mc_chroma(ref0[pl], ysc, xsc, mv0_8.reshape(n8, 2),
                          bh=4, bw=4)
        c1 = mc.mc_chroma(ref1[pl], ysc, xsc, mv1_8.reshape(n8, 2),
                          bh=4, bw=4)
        c8 = jnp.where(u0 & u1, (c0 + c1 + 1) >> 1,
                       jnp.where(u0, c0, c1))
        pc = c8.reshape(2 * mbh, 2 * mbw, 4, 4).transpose(0, 2, 1, 3) \
               .reshape(8 * mbh, 8 * mbw)
        preds_c.append(pc.reshape(mbh, 8, mbw, 8).transpose(0, 2, 1, 3)
                       .reshape(n, 8, 8))
    return pred_y, preds_c[0], preds_c[1]


@functools.partial(jax.jit, static_argnames=("mbh", "mbw"))
def bipred_satd_device(y, ref0_luma, ref1_luma, use0, use1, mv0_8,
                       mv1_8, mbh: int, mbw: int):
    """SATD of the (approximate) direct prediction per MB — the batch
    stand-in for x264's serial direct cost (analyse.c B direct)."""
    n = mbh * mbw
    n8 = 4 * n
    ys8 = (jnp.arange(n8) // (2 * mbw)) * 8
    xs8 = (jnp.arange(n8) % (2 * mbw)) * 8
    u0 = use0.reshape(n8)[:, None, None]
    u1 = use1.reshape(n8)[:, None, None]
    p0 = mc.mc_luma(ref0_luma, ys8, xs8, mv0_8.reshape(n8, 2),
                    bh=8, bw=8)
    p1 = mc.mc_luma(ref1_luma, ys8, xs8, mv1_8.reshape(n8, 2),
                    bh=8, bw=8)
    p8 = jnp.where(u0 & u1, (p0 + p1 + 1) >> 1, jnp.where(u0, p0, p1))
    pred = p8.reshape(2 * mbh, 2 * mbw, 8, 8).transpose(0, 2, 1, 3) \
             .reshape(16 * mbh, 16 * mbw)
    pred = pred.reshape(mbh, 16, mbw, 16).transpose(0, 2, 1, 3) \
               .reshape(n, 16, 16)
    cur = _mb_tiles16(y, mbh, mbw)
    return QT.satd_tables(QT.wht16(cur),
                          QT.wht16(pred)).reshape(mbh, mbw)


@functools.partial(jax.jit, static_argnames=("mbh", "mbw", "decimate",
                                             "trellis"))
def encode_b_frame_device(y, u, v, ref0_luma, ref0_u, ref0_v,
                          ref1_luma, ref1_u, ref1_v,
                          use0, use1, mv0_8, mv1_8, qp, qpc,
                          mbh: int, mbw: int, decimate: bool = True,
                          trellis: bool = False):
    """Final B encode at per-8x8 (use, mv) fields for both lists.
    Same output dict as encode_p_frame_device8."""
    n = mbh * mbw
    ref0 = {"luma": ref0_luma, "u": ref0_u, "v": ref0_v}
    ref1 = {"luma": ref1_luma, "u": ref1_u, "v": ref1_v}
    pred_y, pred_u, pred_v = _assemble_pred_b(
        ref0, ref1, use0, use1, mv0_8, mv1_8, mbh, mbw)

    from .inter import luma_p_encode
    cur = _mb_tiles16(y, mbh, mbw)
    lev, rec = luma_p_encode(cur, pred_y, qp, decimate, trellis)
    nz_blk = jnp.any(lev != 0, axis=(1, 2))
    cbp8 = jnp.any(nz_blk.reshape(n, 2, 2, 2, 2), axis=(2, 4))
    cbp_luma = (cbp8[:, 0, 0] * 1 + cbp8[:, 0, 1] * 2
                + cbp8[:, 1, 0] * 4 + cbp8[:, 1, 1] * 8)

    chroma_out = []
    for plane, predc in ((u, pred_u), (v, pred_v)):
        curc = plane.reshape(mbh, 8, mbw, 8).transpose(0, 2, 1, 3) \
                    .reshape(n, 8, 8)
        resc = to_blocks(curc - predc, 4)
        coef = T.dct4x4(resc)
        dc = coef[:, 0, 0][..., None, None]
        dch = T.hadamard2x2(dc)[..., 0, 0]
        ac = coef.at[:, 0, 0].set(0)
        if trellis:
            from .inter import (trellis_quant_chroma_dc,
                                trellis_quant_chroma_ac)
            dc_lev = trellis_quant_chroma_dc(dch, qpc)
            ac_lev = trellis_quant_chroma_ac(ac, qpc)
        else:
            dc_lev = T.quant_dc(dch, qpc, intra=False)
            ac_lev = T.quant4x4(ac, qpc, intra=False)
        if decimate:
            zzc = _zigzag_gather(ac_lev)
            scc = jnp.sum(decimate_score(zzc), axis=(1, 2))
            keep_c = scc >= 7
            ac_lev = ac_lev * keep_c[:, None, None, None, None]
        chroma_out.append((dc_lev, ac_lev, predc))

    ac_nz = jnp.stack([jnp.any(c[1] != 0, axis=(1, 2, 3, 4))
                       for c in chroma_out]).any(axis=0)
    dc_nz = jnp.stack([jnp.any(c[0] != 0, axis=(1, 2))
                       for c in chroma_out]).any(axis=0)
    cbp_chroma = jnp.where(ac_nz, 2, jnp.where(dc_nz, 1, 0))

    recs_c, levs_c = [], []
    for dc_lev, ac_lev, predc in chroma_out:
        deqc = T.dequant4x4(ac_lev, qpc)
        dc_rec = T.dequant_dc_chroma(
            T.hadamard2x2(dc_lev[..., None, None])[..., 0, 0], qpc)
        deqc = deqc.at[:, 0, 0].set(dc_rec)
        rc = T.idct4x4_add(to_blocks(predc, 4), deqc)
        rc = rc.reshape(n, 4, 4, 2, 2).transpose(0, 3, 1, 4, 2) \
               .reshape(n, 8, 8)
        recs_c.append(rc)
        levs_c.append((dc_lev, ac_lev))

    def untile(t, b):
        return t.reshape(mbh, mbw, b, b).transpose(0, 2, 1, 3) \
                .reshape(mbh * b, mbw * b)

    return {
        "luma_lev": jnp.moveaxis(lev, (1, 2), (3, 4)).reshape(
            mbh, mbw, 256).astype(jnp.int16),
        "cbp_luma": cbp_luma.reshape(mbh, mbw).astype(jnp.uint8),
        "cbp_chroma": cbp_chroma.reshape(mbh, mbw).astype(jnp.uint8),
        "chroma_dc": jnp.stack(
            [levs_c[0][0], levs_c[1][0]],
            axis=1).reshape(mbh, mbw, 8).astype(jnp.int16),
        "chroma_ac": jnp.stack(
            [jnp.moveaxis(levs_c[0][1], (1, 2), (3, 4)),
             jnp.moveaxis(levs_c[1][1], (1, 2), (3, 4))],
            axis=1).reshape(mbh, mbw, 128).astype(jnp.int16),
        "recon_y": untile(rec, 16).astype(jnp.uint8),
        "recon_u": untile(recs_c[0], 8).astype(jnp.uint8),
        "recon_v": untile(recs_c[1], 8).astype(jnp.uint8),
    }


# ---------------------------------------------------------------------------
# Spatial direct derivation + host raster scan (spec 8.4.1.2.2)
# ---------------------------------------------------------------------------

# per-8x8 colocated corner 4x4 (direct_8x8_inference_flag == 1)
_COL_CORNERS = [(0, 0), (0, 3), (3, 0), (3, 3)]


def spatial_direct(g0: _Grid, g1: _Grid, col_mv4, col_ref4,
                   my: int, mx: int):
    """Spatial direct MVs for one MB (spec 8.4.1.2.2, single ref per
    list). col_mv4/col_ref4: the L1[0] anchor's own motion field.
    Returns (use0, use1, mv0 [4,2] per 8x8 z-order, mv1 [4,2])."""
    y4, x4 = 4 * my, 4 * mx
    refs, mvps = [], []
    for g in (g0, g1):
        mva, ra, av_a = g.nb(y4, x4 - 1)
        mvb, rb, av_b = g.nb(y4 - 1, x4)
        mvc, rc, av_c = g.nb(y4 - 1, x4 + 4)
        if not av_c:
            mvc, rc, av_c = g.nb(y4 - 1, x4 - 1)
        cand = [r for r in (ra, rb, rc) if r >= 0]
        ref = min(cand) if cand else -1
        refs.append(ref)
        if ref >= 0:
            mvps.append(unit_mvp(g, y4, x4, 4, D_16x16, 0, ref=ref))
        else:
            mvps.append(np.zeros(2, np.int32))
    mv0 = np.zeros((4, 2), np.int32)
    mv1 = np.zeros((4, 2), np.int32)
    if refs[0] < 0 and refs[1] < 0:
        # directZeroPredictionFlag: both lists, zero MVs, refs 0
        return True, True, mv0, mv1
    use0, use1 = refs[0] >= 0, refs[1] >= 0
    for b, (cy, cx) in enumerate(_COL_CORNERS):
        colr = int(col_ref4[y4 + cy, x4 + cx])
        colm = col_mv4[y4 + cy, x4 + cx]
        col_zero = (colr == 0 and abs(int(colm[0])) <= 1
                    and abs(int(colm[1])) <= 1)
        for use, ref, mvp, out in ((use0, refs[0], mvps[0], mv0),
                                   (use1, refs[1], mvps[1], mv1)):
            if use:
                out[b] = 0 if (ref == 0 and col_zero) else mvp
    return use0, use1, mv0, mv1


def approx_direct_fields(mv0, mv1, col_mv4, col_ref4):
    """Approximate direct fields for the device direct-cost
    pre-evaluation: every MB is assumed committed L0@mv0 / L1@mv1
    (the 'inter-field' approximation — exact only where neighbours
    end up choosing those modes; the committed direct MVs are always
    re-derived exactly in scan_b_frame). Returns (use0, use1,
    mv0_8 [2mbh,2mbw,2], mv1_8) per 8x8."""
    mbh, mbw = mv0.shape[:2]
    outs = []
    for mv in (mv0, mv1):
        g = _Grid(mbh, mbw)
        g.mv[:] = np.repeat(np.repeat(mv, 4, 0), 4, 1)
        g.ref[:] = 0
        g.dec[:] = True
        dmv8 = np.zeros((2 * mbh, 2 * mbw, 2), np.int32)
        for my in range(mbh):
            for mx in range(mbw):
                y4, x4 = 4 * my, 4 * mx
                mvp = unit_mvp(g, y4, x4, 4, D_16x16, 0, ref=0)
                for b, (cy, cx) in enumerate(_COL_CORNERS):
                    colr = int(col_ref4[y4 + cy, x4 + cx])
                    colm = col_mv4[y4 + cy, x4 + cx]
                    cz = (colr == 0 and abs(int(colm[0])) <= 1
                          and abs(int(colm[1])) <= 1)
                    dmv8[2 * my + (b >> 1), 2 * mx + (b & 1)] = \
                        0 if cz else mvp
        outs.append(dmv8)
    ones = np.ones((2 * mbh, 2 * mbw), np.int32)
    return ones, ones.copy(), outs[0], outs[1]


def scan_b_frame(c_dir, c0, c1, cbi, mv0, mv1, col_mv4, col_ref4,
                 lam: int):
    """Host raster scan for a B frame: per-MB mode decision + exact
    direct derivation + mvd/mvp. Returns (mode [mbh,mbw] in
    {0 direct,1 L0,2 L1,3 BI}, use0/use1 [2mbh,2mbw] int32,
    fmv0/fmv1 [2mbh,2mbw,2], mvd0/mvd1 [mbh,mbw,2])."""
    mbh, mbw = c0.shape
    g0, g1 = _Grid(mbh, mbw), _Grid(mbh, mbw)
    mode = np.zeros((mbh, mbw), np.int32)
    use0 = np.zeros((2 * mbh, 2 * mbw), np.int32)
    use1 = np.zeros((2 * mbh, 2 * mbw), np.int32)
    fmv0 = np.zeros((2 * mbh, 2 * mbw, 2), np.int32)
    fmv1 = np.zeros((2 * mbh, 2 * mbw, 2), np.int32)
    mvd0 = np.zeros((mbh, mbw, 2), np.int32)
    mvd1 = np.zeros((mbh, mbw, 2), np.int32)
    hdr = _B_HDR_BITS
    for my in range(mbh):
        for mx in range(mbw):
            y4, x4 = 4 * my, 4 * mx
            du0, du1, dmv0, dmv1 = spatial_direct(
                g0, g1, col_mv4, col_ref4, my, mx)
            cands = np.array([
                c_dir[my, mx] + lam * hdr[0],
                c0[my, mx] + lam * hdr[1],
                c1[my, mx] + lam * hdr[2],
                cbi[my, mx] + lam * hdr[3]], np.int64)
            m = int(np.argmin(cands))
            mode[my, mx] = m
            sy, sx = slice(2 * my, 2 * my + 2), slice(2 * mx, 2 * mx + 2)
            if m == B_DIRECT:
                u0i, u1i = int(du0), int(du1)
                use0[sy, sx] = u0i
                use1[sy, sx] = u1i
                fmv0[sy, sx] = dmv0.reshape(2, 2, 2)
                fmv1[sy, sx] = dmv1.reshape(2, 2, 2)
                # commit per 8x8 (direct MVs can differ per block)
                for b in range(4):
                    by, bx = y4 + 2 * (b >> 1), x4 + 2 * (b & 1)
                    g0.commit(by, bx, 2, 2, dmv0[b],
                              ref=0 if u0i else -1)
                    g1.commit(by, bx, 2, 2, dmv1[b],
                              ref=0 if u1i else -1)
                continue
            if m in (B_L0, B_BI):
                mvp = unit_mvp(g0, y4, x4, 4, D_16x16, 0, ref=0)
                mvd0[my, mx] = mv0[my, mx] - mvp
            if m in (B_L1, B_BI):
                mvp = unit_mvp(g1, y4, x4, 4, D_16x16, 0, ref=0)
                mvd1[my, mx] = mv1[my, mx] - mvp
            u0i = 1 if m in (B_L0, B_BI) else 0
            u1i = 1 if m in (B_L1, B_BI) else 0
            use0[sy, sx] = u0i
            use1[sy, sx] = u1i
            if u0i:
                fmv0[sy, sx] = mv0[my, mx]
            if u1i:
                fmv1[sy, sx] = mv1[my, mx]
            g0.commit(y4, x4, 4, 4,
                      mv0[my, mx] if u0i else np.zeros(2, np.int32),
                      ref=0 if u0i else -1)
            g1.commit(y4, x4, 4, 4,
                      mv1[my, mx] if u1i else np.zeros(2, np.int32),
                      ref=0 if u1i else -1)
    return mode, use0, use1, fmv0, fmv1, mvd0, mvd1
