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

from .stc import stc_embed
from .cost import alt_mv_costs, cost_mv_table


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
                cov, message, rho_cov, h=st.stc_h, key=st.key or 1)
        else:
            stego_bits, _cost = stc_embed(cov, message, rho_cov,
                                          h=st.stc_h, key=st.key or 1)
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
        res2 = I.encode_p_frame_device(
            y, u, v, enc.ref["luma"], enc.ref["u"], enc.ref["v"],
            jnp.asarray(final_mv), qp, qpc, mbh, mbw,
            decimate=p.dct_decimate, force_zero=jnp.asarray(skip1))
        return final_mv, skip1, mvd2, res2
