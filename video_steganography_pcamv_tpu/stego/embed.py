"""Stego engine: per-P-frame embedding pipeline.

Reference flow (encoder.c:1276-1862 + the two-pass driver :2380-2390):
pass-1 encode -> cover/rho assembly -> STC -> re-encode with flips.
Here the "two passes" are two *batched device calls* around a pure
analysis, with pass-consistency by construction:

  1. cover = LSB(mvx+mvy) of every coded (non-skip) P16x16 MB in raster
     order (encoder.c:1622-1627 D_16x16 case);
  2. rho = RCA alternative-MV cost (stego/cost.py), alpha_com term of
     the blend is 0 by default exactly as the reference ships it
     (encoder.c:1651-1652); MVC multipliers don't apply to 16x16-only
     frames (the reference adjusts only multi-MV partitions);
  3. STC embed (h=10 default, encoder.c:1843) -> flip vector;
  4. flipped MBs substitute their alternative MV; a forced host rescan
     re-derives skip MVs/mvds in the new context and the frame is
     re-encoded on device with pass-1 skip decisions FORCED
     (the reference's pass-2 forcing, analyse.c:2658-2674, 3001-3107).

Message source: seeded PRNG from `key`, or bytes from `emfile`
(functional here; parsed-but-dead in the reference, x264.c:518,525).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .stc import stc_embed, stc_feasible_k, StcState
from .cost import alt_mv_costs, cost_mv_table


def _z_of(oy4: int, ox4: int) -> int:
    """z index (LUMA_SCAN order) of 4x4 cell (oy4, ox4) within a MB."""
    return 4 * (2 * (oy4 >> 1) + (ox4 >> 1)) + 2 * (oy4 & 1) + (ox4 & 1)



# ---- vectorized sub-8x8 slot machinery (VERDICT weak #5: the per-MB
# python triple loops cost O(8160) interpreter work per 1080p frame) ----

def _slot_cell_offsets():
    """(oy, ox) of each z-slot's top-left 4x4 cell."""
    oy = np.zeros(16, np.int64)
    ox = np.zeros(16, np.int64)
    for sslot in range(16):
        b, w = sslot // 4, sslot % 4
        oy[sslot] = 2 * (b >> 1) + (w >> 1)
        ox[sslot] = 2 * (b & 1) + (w & 1)
    return oy, ox


_SLOT_OY, _SLOT_OX = _slot_cell_offsets()

# unit-start slots for MB partitions 0..2 (16x16 / 16x8 / 8x16)
_PART_START = np.zeros((3, 16), bool)
_PART_START[0, 0] = True
_PART_START[1, [0, 8]] = True
_PART_START[2, [0, 4]] = True
# unit-start pattern within an 8x8 block by sub_mb_type
_SUB_START = np.array([[1, 0, 0, 0],    # P_L0_8x8
                       [1, 0, 1, 0],    # 8x4: slots +0, +2
                       [1, 1, 0, 0],    # 4x8: slots +0, +1
                       [1, 1, 1, 1]], bool)
# unit extent in 4x4 cells (h4, w4) by (part, sub_mb_type) at a start
_UNIT_H4 = np.array([[4, 4, 4, 4], [2, 2, 2, 2], [4, 4, 4, 4],
                     [0, 0, 0, 0]], np.int64)
_UNIT_W4 = np.array([[4, 4, 4, 4], [4, 4, 4, 4], [2, 2, 2, 2],
                     [0, 0, 0, 0]], np.int64)
_SUB_H4 = np.array([2, 1, 2, 1], np.int64)
_SUB_W4 = np.array([2, 2, 1, 1], np.int64)


def unit_start_mask(part, sub_type):
    """[mbh, mbw, 16] bool: slot starts a coding unit (ascending slot
    order == the reference's unit coding order)."""
    mbh, mbw = part.shape
    U = _PART_START[np.clip(part, 0, 2)]          # [mbh,mbw,16]
    U = U.copy()
    is8 = part == 3
    if is8.any():
        stb = sub_type.astype(np.int64)           # [mbh,mbw,4]
        pat = _SUB_START[stb]                     # [mbh,mbw,4,4]
        U[is8] = pat.reshape(mbh, mbw, 16)[is8]
    return U


def unit_extents(part, sub_type):
    """(h4, w4) per slot [mbh,mbw,16] (meaningful at unit starts)."""
    mbh, mbw = part.shape
    h4 = _UNIT_H4[np.clip(part, 0, 2)][..., :1].repeat(16, -1)
    w4 = _UNIT_W4[np.clip(part, 0, 2)][..., :1].repeat(16, -1)
    is8 = part == 3
    if is8.any():
        stb = sub_type.astype(np.int64)
        sh = _SUB_H4[stb][..., None].repeat(4, -1).reshape(mbh, mbw, 16)
        sw = _SUB_W4[stb][..., None].repeat(4, -1).reshape(mbh, mbw, 16)
        h4[is8] = sh[is8]
        w4[is8] = sw[is8]
    return h4, w4


def slot_unit_mvs(mv4, mbh, mbw):
    """[mbh, mbw, 16, 2]: the MV at each slot's top-left 4x4 cell."""
    ys = 4 * np.arange(mbh)[:, None, None] + _SLOT_OY[None, None, :]
    xs = 4 * np.arange(mbw)[None, :, None] + _SLOT_OX[None, None, :]
    return mv4[ys, xs]


def _unit_slots(part, sub_type, mbh, mbw):
    """Per-MB unit geometry (coding order) + slot ids (= z index of the
    unit's first member 4x4)."""
    from ..encoder.scan import mb_units
    units = [[None] * mbw for _ in range(mbh)]
    slots = [[None] * mbw for _ in range(mbh)]
    for my in range(mbh):
        for mx in range(mbw):
            g = mb_units(int(part[my, mx]), sub_type[my, mx])
            units[my][mx] = g
            slots[my][mx] = [_z_of(oy, ox) for (oy, ox, _, _) in g]
    return units, slots


class StegoEngine:
    def __init__(self, params):
        self.p = params
        st = params.stego
        self._rng = np.random.RandomState(st.key & 0x7FFFFFFF or 0x5EED)
        self._emfile_bits = None
        self._emfile_pos = 0
        if st.em_file:
            data = np.frombuffer(open(st.em_file, "rb").read(), np.uint8)
            self._emfile_bits = np.unpackbits(data)
        # record of embedded messages per frame (for tests/verification)
        self.sent_messages: list[np.ndarray] = []
        # the reference's persistent getMatrix LCG word (embed.h:134):
        # one per stream, replayed by the extractor in frame order
        self._stc_state = StcState()

    def _next_message(self, an: int) -> np.ndarray:
        if self._emfile_bits is not None:
            end = min(self._emfile_pos + an, len(self._emfile_bits))
            m = self._emfile_bits[self._emfile_pos:end].astype(np.uint8)
            self._emfile_pos = end
            return m
        return self._rng.randint(0, 2, an).astype(np.uint8)

    def embed_frame(self, enc, y, u, v, mv: np.ndarray, res1: dict,
                    skip1: np.ndarray, mvp1: np.ndarray):
        """Returns (final_mv, skip, mvd, res2) replacing the pass-1
        results, or None if nothing was embedded this frame."""
        from ..encoder import inter as I
        from ..encoder import me as ME
        from ..ops.transform import chroma_qp

        p, st = self.p, self.p.stego
        mbh, mbw = p.mb_height, p.mb_width
        qp = enc._cur_qp  # per-frame QP from rate control
        cover_mask = ~skip1                        # raster-order cover
        n_cov = int(cover_mask.sum())
        rate = st.em_rate
        an = int(rate) if rate > 1 else int(rate * n_cov)
        an = min(an, n_cov)
        # deterministic feasibility reduction (see stc.stc_feasible_k):
        # the reference fails frames whose syndrome is unreachable; a
        # blind extractor can't see that, so both sides shrink k to the
        # parity matrix's rank instead
        an = stc_feasible_k(n_cov, an, st.stc_h, self._stc_state)
        enc.stats.mv_covers += n_cov
        if an <= 0 or n_cov == 0:
            self.sent_messages.append(np.zeros(0, np.uint8))
            return None

        lam = ME.lambda_tab(qp)
        tables = getattr(enc, "_ptables", None)
        if tables is not None:
            from ..encoder.analyse2 import stego_costs_from_table
            rho, alt_mv, _flags = stego_costs_from_table(
                y, tables["blocks"], tables["wht"], tables["r_idx"],
                jnp.asarray(mv), jnp.asarray(mvp1),
                jnp.asarray(cost_mv_table(lam)), qp, mbh, mbw,
                decimate=p.dct_decimate)
        else:
            rho, alt_mv, _flags = alt_mv_costs(
                y, enc.ref["luma"], jnp.asarray(mv), jnp.asarray(mvp1),
                jnp.asarray(cost_mv_table(lam)), qp, mbh, mbw,
                decimate=p.dct_decimate)
        rho = np.asarray(rho)
        alt_mv = np.asarray(alt_mv)

        cover_bits = ((mv[..., 0] + mv[..., 1]) & 1).astype(np.uint8)
        cov = cover_bits[cover_mask]
        rho_cov = rho[cover_mask].astype(np.float64)
        # alpha blend (encoder.c:1651-1652, :1782-1784): rho_final =
        # alpha_loc * rho_loc + alpha_com * rho_com; alpha_com ships 0
        rho_cov = st.alpha_loc * rho_cov
        if st.alpha_com != 0.0:
            from ..ops.uniward import dense_mv_field, mv_field_cost
            mv_h, mv_v = dense_mv_field(mv)
            rho_com = np.asarray(mv_field_cost(jnp.asarray(mv_h),
                                               jnp.asarray(mv_v)))
            # D_16x16 uses the MB's top-left 4x4 site (encoder.c:1781)
            rho_com_mb = rho_com[::4, ::4]
            rho_cov = rho_cov + st.alpha_com * \
                rho_com_mb[cover_mask].astype(np.float64)

        message = self._next_message(an)
        if enc._native is not None:
            from .. import native
            stego_bits, _cost = native.stc_embed(
                cov, message, rho_cov, h=st.stc_h, state=self._stc_state)
        else:
            stego_bits, _cost = stc_embed(cov, message, rho_cov,
                                          h=st.stc_h, state=self._stc_state)
        flip_cov = (cov ^ stego_bits).astype(bool)
        self.sent_messages.append(message)
        enc.stats.message_bits += an
        enc.stats.mv_flips += int(flip_cov.sum())

        flip_full = np.zeros((mbh, mbw), bool)
        flip_full[cover_mask] = flip_cov
        mv2 = mv.copy()
        mv2[flip_full] = alt_mv[flip_full]

        if enc._native is not None:
            from .. import native
            final_mv, mvd2 = native.host_scan_p_forced(mv2, skip1)
        else:
            final_mv, mvd2 = I.host_scan_p_forced(mv2, skip1)
        qpc = chroma_qp(qp, p.chroma_qp_offset)
        # pass-2 re-encode must mirror the pass-1 configuration
        # (trellis + denoise), or --nr/--trellis silently no-op under
        # embedding while pass-1 skip/cbp decisions assumed them
        res2 = I.encode_p_frame_device(
            y, u, v, enc.ref["luma"], enc.ref["u"], enc.ref["v"],
            jnp.asarray(final_mv), qp, qpc, mbh, mbw,
            decimate=p.dct_decimate, force_zero=jnp.asarray(skip1),
            trellis=bool(p.trellis), nr_offset=enc._nr_offset())
        return final_mv, skip1, mvd2, res2

    # ------------------------------------------------------------------
    def embed_frame_parts(self, enc, y, u, v, part: np.ndarray,
                          mv8: np.ndarray, res1: dict, skip1: np.ndarray,
                          mvp_u: np.ndarray, ref8=None):
        """Partition-aware embedding: cover spans every unit MV of
        every coded P MB (reference cover walk encoder.c:1566-1647),
        rho gets the MVC adjustment (encoder.c:1649-1819: c1 for 2-MV
        partitions with |d|<2, (c2*n+1) for all-8x8 quads).
        Returns (final_mv8, skip, mvd4, res2) or None."""
        from ..encoder import me as ME
        from ..encoder import inter as I
        from ..encoder import scan as SCAN
        from ..encoder.partition import (stego_costs_parts, N_UNITS,
                                         UNIT_BLOCKS)
        from ..ops.transform import chroma_qp

        p, st = self.p, self.p.stego
        mbh, mbw = p.mb_height, p.mb_width
        qp = enc._cur_qp
        nu = N_UNITS[part]                                  # [mbh,mbw]
        covered = (~skip1) * nu
        n_cov = int(covered.sum())
        rate = st.em_rate
        an = int(rate) if rate > 1 else int(rate * n_cov)
        an = min(an, n_cov)
        # deterministic feasibility reduction (see stc.stc_feasible_k):
        # the reference fails frames whose syndrome is unreachable; a
        # blind extractor can't see that, so both sides shrink k to the
        # parity matrix's rank instead
        an = stc_feasible_k(n_cov, an, st.stc_h, self._stc_state)
        if an <= 0 or n_cov == 0:   # counters handled by apply_costs
            enc.stats.mv_covers += n_cov
            self.sent_messages.append(np.zeros(0, np.uint8))
            return None

        lam = ME.lambda_tab(qp)
        t = enc._ptables8
        rho_u, alt_u, _valid = stego_costs_parts(
            y, t["blocks"], t["wht"], t["r_idx"], jnp.asarray(part),
            jnp.asarray(mv8), jnp.asarray(mvp_u),
            jnp.asarray(cost_mv_table(lam)), qp, mbh, mbw,
            decimate=p.dct_decimate)
        # rho + alt ride one pull (alt qpel MVs are exact in f32)
        n_mb = mbh * mbw
        packed = np.asarray(jnp.concatenate(
            [rho_u.reshape(-1).astype(jnp.float32),
             alt_u.reshape(-1).astype(jnp.float32)]))
        rho_np = packed[:4 * n_mb].reshape(mbh, mbw, 4)
        alt_np = packed[4 * n_mb:].reshape(mbh, mbw, 4, 2) \
            .astype(np.int32)
        final8, skip1, mvd2 = self.apply_costs(
            enc, part, mv8, skip1, rho_np, alt_np, ref8=ref8)
        qpc = chroma_qp(qp, p.chroma_qp_offset)
        # AQ: the flip re-encode quantizes at the same per-MB grid the
        # pass-1 encode used (rho stays at frame-QP lambda — it only
        # orders flip costs; blind extraction never sees it)
        qp_enc, qpc_enc = qp, qpc
        if getattr(enc, "_aq_grids", None) is not None:
            qp_enc = jnp.asarray(enc._aq_grids[0])
            qpc_enc = jnp.asarray(enc._aq_grids[1])
        if ref8 is not None:
            refs_luma, refs_u, refs_v = enc._mref_stack
            res2 = I.encode_p_frame_device8_mref(
                y, u, v, refs_luma, refs_u, refs_v,
                jnp.asarray(final8), jnp.asarray(ref8), qp_enc,
                qpc_enc, mbh, mbw, decimate=p.dct_decimate,
                force_zero=jnp.asarray(skip1),
                trellis=bool(p.trellis), nr_offset=enc._nr_offset())
        else:
            res2 = I.encode_p_frame_device8(
                y, u, v, enc.ref["luma"], enc.ref["u"], enc.ref["v"],
                jnp.asarray(final8), qp_enc, qpc_enc, mbh, mbw,
                decimate=p.dct_decimate, force_zero=jnp.asarray(skip1),
                trellis=bool(p.trellis), nr_offset=enc._nr_offset(),
                trans8=p.transform_8x8, rd=bool(p.rd))
        return final8, skip1, mvd2, res2

    def embed_frame_sub(self, enc, y, u, v, part: np.ndarray,
                        sub_type: np.ndarray, mv4: np.ndarray,
                        skip1: np.ndarray, mvp16: np.ndarray,
                        ref8: np.ndarray | None = None):
        """Sub-8x8-partition-aware embedding: the cover spans every
        unit MV including 8x4/4x8/4x4 sub-units (the reference's
        D_L0_8x4/4x8/4x4 cover cases, encoder.c:1566-1647 +
        analyse.c:3518-3689). mvp16: [mbh,mbw,16,2] per-unit MVPs in
        CODING order (from scan_p_frame_sub).
        Returns (final_mv4, skip, mvd16, res2) or None."""
        from ..encoder import me as ME
        from ..encoder import inter as I
        from ..encoder import scan as SCAN
        from ..encoder.partition import stego_costs_sub
        from ..ops.transform import chroma_qp

        p, st = self.p, self.p.stego
        mbh, mbw = p.mb_height, p.mb_width
        qp = enc._cur_qp
        U = unit_start_mask(part, sub_type)
        nu = U.sum(-1).astype(np.int32)
        covered = (~skip1) * nu
        n_cov = int(covered.sum())
        rate = st.em_rate
        an = int(rate) if rate > 1 else int(rate * n_cov)
        an = min(an, n_cov)
        # deterministic feasibility reduction (see stc.stc_feasible_k):
        # the reference fails frames whose syndrome is unreachable; a
        # blind extractor can't see that, so both sides shrink k to the
        # parity matrix's rank instead
        an = stc_feasible_k(n_cov, an, st.stc_h, self._stc_state)
        if an <= 0 or n_cov == 0:
            enc.stats.mv_covers += n_cov
            self.sent_messages.append(np.zeros(0, np.uint8))
            return None

        # coding-order MVPs -> slot-indexed (ascending slot order is
        # coding order; rank = exclusive cumsum of the start mask)
        rank = np.cumsum(U, axis=-1) - U
        mvp_s = np.where(
            U[..., None],
            np.take_along_axis(mvp16, np.minimum(rank, 15)[..., None]
                               .repeat(2, -1), axis=2),
            0).astype(np.int32)

        lam = ME.lambda_tab(qp)
        t = enc._ptables4
        rho_s, alt_s, _valid = stego_costs_sub(
            y, t["blocks"], t["wht"], t["r_idx"], jnp.asarray(part),
            jnp.asarray(sub_type), jnp.asarray(mv4), jnp.asarray(mvp_s),
            jnp.asarray(cost_mv_table(lam)), qp, mbh, mbw,
            decimate=p.dct_decimate)
        final4, skip1, mvd2 = self.apply_costs_sub(
            enc, part, sub_type, mv4, skip1, np.asarray(rho_s),
            np.asarray(alt_s), ref8=ref8)
        qpc = chroma_qp(qp, p.chroma_qp_offset)
        # AQ: re-encode at the pass-1 per-MB grid (see
        # embed_frame_parts — rho stays at frame-QP lambda)
        qp_enc, qpc_enc = qp, qpc
        if getattr(enc, "_aq_grids", None) is not None:
            qp_enc = jnp.asarray(enc._aq_grids[0])
            qpc_enc = jnp.asarray(enc._aq_grids[1])
        if ref8 is not None:
            # multi-ref re-encode: flips alternate MVs, never refs —
            # each block's MC reads its own pass-1 DPB entry
            refs_l, refs_u, refs_v = enc._mref_stack4
            ref4_dev = jnp.repeat(jnp.repeat(jnp.asarray(ref8), 2, 0),
                                  2, 1)
            res2 = I.encode_p_frame_device4_mref(
                y, u, v, refs_l, refs_u, refs_v, jnp.asarray(final4),
                ref4_dev, qp_enc, qpc_enc, mbh, mbw,
                decimate=p.dct_decimate, force_zero=jnp.asarray(skip1),
                trellis=bool(p.trellis), nr_offset=enc._nr_offset())
        else:
            res2 = I.encode_p_frame_device4(
                y, u, v, enc.ref["luma"], enc.ref["u"], enc.ref["v"],
                jnp.asarray(final4), qp_enc, qpc_enc, mbh, mbw,
                decimate=p.dct_decimate, force_zero=jnp.asarray(skip1),
                trellis=bool(p.trellis), nr_offset=enc._nr_offset())
        if p.transform_8x8 and ref8 is None:
            # trans8-eligible MBs (all partitions >= 8x8) rejoin the
            # 8x8-capable encode after flips — the same merge as the
            # pass-1 sub path (core._encode_p_sub); the transform
            # decision is re-derived post-flip, like x264's pass-2
            # analysis re-runs x264_mb_analyse_transform
            from ..encoder.core import _merge_res_trans8
            elig = (part != 3) | np.all(sub_type == 0, axis=-1)
            if elig.any():
                mv8_e = jnp.asarray(
                    np.ascontiguousarray(final4[::2, ::2]))
                res8 = I.encode_p_frame_device8(
                    y, u, v, enc.ref["luma"], enc.ref["u"],
                    enc.ref["v"], mv8_e, qp_enc, qpc_enc, mbh, mbw,
                    decimate=p.dct_decimate,
                    force_zero=jnp.asarray(skip1),
                    trellis=bool(p.trellis),
                    nr_offset=enc._nr_offset(), trans8=True,
                    rd=bool(p.rd), t8_allow=jnp.asarray(elig))
                res2 = _merge_res_trans8(res2, res8,
                                         jnp.asarray(elig), mbh, mbw)
        return final4, skip1, mvd2, res2

    def apply_costs_sub(self, enc, part, sub_type, mv4, skip1, rho_s,
                        alt_s, ref8=None):
        """Host half of sub-partition embedding: MVC adjustment
        (pair rule for 2-MV units incl. 8x4/4x8, quad-cycle for 8x8 and
        4x4 quads — the reference's encoder.c:1649-1819 generalized to
        sub shapes), cover assembly in coding order, STC, flips, forced
        rescan. Returns (final_mv4, skip, mvd16)."""
        from ..encoder import scan as SCAN
        p, st = self.p, self.p.stego
        mbh, mbw = p.mb_height, p.mb_width
        rho_s = rho_s.astype(np.float64).copy()
        nu = unit_start_mask(part, sub_type).sum(-1).astype(np.int32)
        covered = (~skip1) * nu
        n_cov = int(covered.sum())
        rate = st.em_rate
        an = int(rate) if rate > 1 else int(rate * n_cov)
        an = min(an, n_cov)
        # deterministic feasibility reduction (see stc.stc_feasible_k):
        # the reference fails frames whose syndrome is unreachable; a
        # blind extractor can't see that, so both sides shrink k to the
        # parity matrix's rank instead
        an = stc_feasible_k(n_cov, an, st.stc_h, self._stc_state)
        enc.stats.mv_covers += n_cov
        if an <= 0 or n_cov == 0:
            self.sent_messages.append(np.zeros(0, np.uint8))
            f4, md, _ = SCAN.scan_p_frame_sub_forced(
                part, sub_type, mv4, skip1, ref8=ref8)
            return f4, skip1, md

        c1, c2 = st.mvc_c1, st.mvc_c2
        umv = slot_unit_mvs(mv4, mbh, mbw)        # [mbh,mbw,16,2]
        coded = ~skip1
        # MB partition pair rule (16x8 pair slots 0/8, 8x16 pair 0/4)
        for pt, (a, b) in ((1, (0, 8)), (2, (0, 4))):
            sel = coded & (part == pt)
            d01 = np.abs(umv[:, :, a].astype(np.int64)
                         - umv[:, :, b]).sum(-1)
            near = sel & (d01 < 2)
            rho_s[near, a] *= c1
            rho_s[near, b] *= c1
        pairs = ((0, 1), (1, 3), (3, 2), (2, 0))
        quad = coded & (part == 3)
        if quad.any():
            # MB-level quad cycle over the 8x8 block MVs
            m8 = umv[:, :, ::4].astype(np.int64)  # [mbh,mbw,4,2]
            cnt = np.zeros((mbh, mbw), np.int64)
            for a, b in pairs:
                for comp in range(2):
                    cnt += (np.abs(m8[:, :, a, comp]
                                   - m8[:, :, b, comp]) <= 1)
            rho_s[quad] *= (c2 * cnt[quad] + 1.0)[:, None]
            # sub-level rules within each 8x8 block
            for bblk in range(4):
                base = 4 * bblk
                stb = sub_type[:, :, bblk]
                for st_v, sa_off in ((1, 2), (2, 1)):
                    sel = quad & (stb == st_v)
                    d = np.abs(umv[:, :, base].astype(np.int64)
                               - umv[:, :, base + sa_off]).sum(-1)
                    near = sel & (d < 2)
                    rho_s[near, base] *= c1
                    rho_s[near, base + sa_off] *= c1
                sel4 = quad & (stb == 3)
                if sel4.any():
                    mq = umv[:, :, base:base + 4].astype(np.int64)
                    cnt4 = np.zeros((mbh, mbw), np.int64)
                    for a, bq in pairs:
                        for comp in range(2):
                            cnt4 += (np.abs(mq[:, :, a, comp]
                                            - mq[:, :, bq, comp]) <= 1)
                    rho_s[sel4, base:base + 4] *= \
                        (c2 * cnt4[sel4] + 1.0)[:, None]
        rho_s *= st.alpha_loc
        U = unit_start_mask(part, sub_type)
        if st.alpha_com != 0.0:
            from ..ops.uniward import mv_field_cost
            rho_com = np.asarray(mv_field_cost(
                jnp.asarray(mv4[..., 0].astype(np.float32)),
                jnp.asarray(mv4[..., 1].astype(np.float32))))
            ys = 4 * np.arange(mbh)[:, None, None] + _SLOT_OY
            xs = 4 * np.arange(mbw)[None, :, None] + _SLOT_OX
            rho_s += np.where(U, st.alpha_com * rho_com[ys, xs], 0.0)

        # cover in coding order: raster MBs, ascending slot index ==
        # reference unit coding order (np.nonzero order over the mask)
        valid = coded[:, :, None] & U
        cov_idx = np.nonzero(valid.reshape(-1))[0]
        umv_f = umv.reshape(-1, 2)[cov_idx]
        cov = ((umv_f[:, 0] + umv_f[:, 1]) & 1).astype(np.uint8)
        rho_cov = rho_s.reshape(-1)[cov_idx].astype(np.float64)

        message = self._next_message(an)
        if enc._native is not None:
            from .. import native
            stego_bits, _cost = native.stc_embed(
                cov, message, rho_cov, h=st.stc_h, state=self._stc_state)
        else:
            stego_bits, _cost = stc_embed(cov, message, rho_cov,
                                          h=st.stc_h, state=self._stc_state)
        flips = (cov ^ stego_bits).astype(bool)
        self.sent_messages.append(message)
        enc.stats.message_bits += an
        enc.stats.mv_flips += int(flips.sum())

        mv4_2 = mv4.copy()
        h4u, w4u = unit_extents(part, sub_type)
        for fi in cov_idx[flips]:
            my, rem = divmod(int(fi), mbw * 16)
            mx, sslot = divmod(rem, 16)
            oy, ox = int(_SLOT_OY[sslot]), int(_SLOT_OX[sslot])
            hh, ww = int(h4u[my, mx, sslot]), int(w4u[my, mx, sslot])
            mv4_2[4 * my + oy:4 * my + oy + hh,
                  4 * mx + ox:4 * mx + ox + ww] = alt_s[my, mx, sslot]

        final4, mvd2, _mvp2 = SCAN.scan_p_frame_sub_forced(
            part, sub_type, mv4_2, skip1, ref8=ref8)
        return final4, skip1, mvd2

    def apply_costs(self, enc, part, mv8, skip1, rho_u, alt_u,
                    ref8=None):
        """Host half of the partition embedding: MVC adjustment, cover
        assembly, STC, flip application, forced rescan. Returns
        (final_mv8, skip, mvd4); callers run the re-encode (the
        multi-stream driver batches it across streams)."""
        from ..encoder import scan as SCAN
        from ..encoder.partition import N_UNITS, UNIT_BLOCKS
        p, st = self.p, self.p.stego
        mbh, mbw = p.mb_height, p.mb_width
        nu = N_UNITS[part]
        rho_u = rho_u.astype(np.float64).copy()
        covered = (~skip1) * nu
        n_cov = int(covered.sum())
        rate = st.em_rate
        an = int(rate) if rate > 1 else int(rate * n_cov)
        an = min(an, n_cov)
        # deterministic feasibility reduction (see stc.stc_feasible_k):
        # the reference fails frames whose syndrome is unreachable; a
        # blind extractor can't see that, so both sides shrink k to the
        # parity matrix's rank instead
        an = stc_feasible_k(n_cov, an, st.stc_h, self._stc_state)
        enc.stats.mv_covers += n_cov
        if an <= 0 or n_cov == 0:
            # nothing to embed: MVs unchanged; rescan for consistency
            self.sent_messages.append(np.zeros(0, np.uint8))
            if enc._native is not None:
                from .. import native
                f8, md, _ = native.scan_p_parts_forced(part, mv8, skip1,
                                                       ref8=ref8)
            else:
                f8, md, _ = SCAN.scan_p_frame_forced(part, mv8, skip1,
                                                     ref8=ref8)
            return f8, skip1, md

        # unit MVs [mbh,mbw,4,2] (z-slot order = coding order)
        mvz = mv8.reshape(mbh, 2, mbw, 2, 2).transpose(0, 2, 1, 3, 4) \
                 .reshape(mbh, mbw, 4, 2)
        unit_mv = np.zeros((mbh, mbw, 4, 2), np.int32)
        for pt, units in UNIT_BLOCKS.items():
            sel = part == pt
            for ui, blks in enumerate(units):
                unit_mv[sel, ui] = mvz[sel, blks[0]]

        # MVC adjustment (encoder.c:1649-1819), vectorized over the
        # MB grid (the reference's per-MB loop costs ~1 s at 1080p in
        # Python on busy content)
        c1, c2 = st.mvc_c1, st.mvc_c2
        coded = ~skip1
        pair = coded & ((part == 1) | (part == 2))
        d01 = np.abs(unit_mv[:, :, 0] - unit_mv[:, :, 1]).sum(-1)
        near = pair & (d01 < 2)
        rho_u[near, 0] *= c1
        rho_u[near, 1] *= c1
        quad = coded & (part == 3)
        cnt = np.zeros((mbh, mbw), np.int64)
        for a, b in ((0, 1), (1, 3), (3, 2), (2, 0)):
            for comp in range(2):
                cnt += (np.abs(unit_mv[:, :, a, comp].astype(np.int64)
                               - unit_mv[:, :, b, comp]) <= 1)
        rho_u[quad] *= (c2 * cnt[quad] + 1.0)[:, None]
        rho_u *= st.alpha_loc
        if st.alpha_com != 0.0:
            from ..ops.uniward import dense_mv_field, mv_field_cost
            from ..encoder.scan import UNIT_GEOM
            mv4 = np.repeat(np.repeat(mv8, 2, 0), 2, 1)
            rho_com = np.asarray(mv_field_cost(
                jnp.asarray(mv4[..., 0].astype(np.float32)),
                jnp.asarray(mv4[..., 1].astype(np.float32))))
            ys4 = 4 * np.arange(mbh)[:, None]
            xs4 = 4 * np.arange(mbw)[None, :]
            for pt_, geom in UNIT_GEOM.items():
                sel = part == pt_
                for ui, (oy, ox, _, _) in enumerate(geom):
                    rho_u[sel, ui] += st.alpha_com * \
                        rho_com[ys4 + oy, xs4 + ox][sel]

        # assemble cover in coding order: raster (my, mx) then unit —
        # exactly np.nonzero's order over the [mbh,mbw,4] mask
        valid = coded[:, :, None] & (np.arange(4)[None, None, :]
                                     < nu[:, :, None])
        cov_idx = np.nonzero(valid.reshape(-1))[0]
        umv_f = unit_mv.reshape(-1, 2)[cov_idx]
        cov = ((umv_f[:, 0] + umv_f[:, 1]) & 1).astype(np.uint8)
        rho_cov = rho_u.reshape(-1)[cov_idx].astype(np.float64)

        message = self._next_message(an)
        if enc._native is not None:
            from .. import native
            stego_bits, _cost = native.stc_embed(
                cov, message, rho_cov, h=st.stc_h, state=self._stc_state)
        else:
            stego_bits, _cost = stc_embed(cov, message, rho_cov,
                                          h=st.stc_h, state=self._stc_state)
        flips = (cov ^ stego_bits).astype(bool)
        self.sent_messages.append(message)
        enc.stats.message_bits += an
        enc.stats.mv_flips += int(flips.sum())

        # apply flips: member blocks of flipped units take the alt MV
        mv8_2 = mv8.copy()
        for fi in cov_idx[flips]:
            my, rem = divmod(int(fi), mbw * 4)
            mx, ui = divmod(rem, 4)
            pt = int(part[my, mx])
            for b in UNIT_BLOCKS[pt][ui]:
                gy, gx = 2 * my + (b >> 1), 2 * mx + (b & 1)
                mv8_2[gy, gx] = alt_u[my, mx, ui]

        if enc._native is not None:
            from .. import native
            final8, mvd2, _mvp2 = native.scan_p_parts_forced(
                part, mv8_2, skip1, ref8=ref8)
        else:
            final8, mvd2, _mvp2 = SCAN.scan_p_frame_forced(
                part, mv8_2, skip1, ref8=ref8)
        return final8, skip1, mvd2
