"""Device in-loop deblocking: knight-wavefront over MB tiles.

Bit-exact jnp twin of native/deblock.cpp (normative spec 8.7 math,
specialised like the C++: progressive, 4x4 transform, single ref, CQP).
The C++ walks MBs in raster order, vertical edges then horizontal per
MB — writes reach 3 pixels into the left/top neighbours, so MB (y,x)
depends on (y,x-1), (y-1,x) AND overlaps (y-1,x+1)'s writes. The
knight wavefront d = mx + 2*my satisfies every such dependency while
same-wave MBs touch disjoint 20x20 tiles (proof sketch: same-wave
neighbours differ by (dy,dx) = (-1,+2), whose tiles are >= 13 columns
apart), so one gather + in-tile static filtering + one scatter per wave
reproduces the serial order exactly.

qp/qpc are traced: one compiled program across rate-controlled frames.
"""

from __future__ import annotations

import functools
import os
import re

import numpy as np
import jax
import jax.numpy as jnp

from ..encoder.intra import wave_tables


def _parse_tables():
    """Read the normative alpha/beta/tc0 tables from the C++ include
    (single source of truth for both twins)."""
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native", "deblock_tables.inc")
    src = open(path).read()

    def arr(name):
        i = src.index(name)
        body = src[src.index("{", i):src.index(";", i)]
        return [int(x) for x in re.findall(r"-?\d+", body)]

    alpha = np.array(arr("ALPHA_TAB"), np.int32)
    beta = np.array(arr("BETA_TAB"), np.int32)
    tc0 = np.array(arr("TC0_TAB"), np.int32).reshape(76, 4)
    return alpha, beta, tc0


ALPHA_TAB, BETA_TAB, TC0_TAB = _parse_tables()


def _clip3(v, lo, hi):
    return jnp.clip(v, lo, hi)


def _luma_edge(samples, bs4, alpha, beta, tc0_row, strong, active):
    """Filter one luma edge for a [W, 16] batch of sample lines.

    samples: tuple p3..q3 of [W,16] int32; bs4: [W,4] per-group bS;
    tc0_row: [W? no —] tc0 table row indexed by bs ([W,16] after expand);
    strong/active: [W] masks. Returns the 6 possibly-updated center
    samples (p2..q2)."""
    p3, p2, p1, p0, q0, q1, q2, q3 = samples
    a = alpha[:, None]
    b = beta[:, None]
    bs = jnp.repeat(bs4, 4, axis=1)                       # [W,16]
    base = ((jnp.abs(p0 - q0) < a) & (jnp.abs(p1 - p0) < b)
            & (jnp.abs(q1 - q0) < b) & active[:, None])

    # ---- normal (bs 1..3), spec 8.7.2.3 / filt_luma_normal ----
    nf = base & (bs > 0) & ~strong[:, None]
    tc0 = tc0_row
    ap = jnp.abs(p2 - p0) < b
    aq = jnp.abs(q2 - q0) < b
    tc = tc0 + ap.astype(jnp.int32) + aq.astype(jnp.int32)
    p1n = p1 + _clip3(((p2 + ((p0 + q0 + 1) >> 1)) >> 1) - p1, -tc0, tc0)
    q1n = q1 + _clip3(((q2 + ((p0 + q0 + 1) >> 1)) >> 1) - q1, -tc0, tc0)
    delta = _clip3((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    p0_n = jnp.clip(p0 + delta, 0, 255)
    q0_n = jnp.clip(q0 - delta, 0, 255)

    # ---- strong (intra MB edge), spec 8.7.2.4 / filt_luma_intra ----
    sf = base & strong[:, None]
    lum = jnp.abs(p0 - q0) < ((a >> 2) + 2)
    sp = lum & ap
    sq = lum & aq
    p0_s3 = (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3
    p1_s = (p2 + p1 + p0 + q0 + 2) >> 2
    p2_s = (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3
    p0_w = (2 * p1 + p0 + q1 + 2) >> 2
    q0_s3 = (p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3
    q1_s = (p0 + q0 + q1 + q2 + 2) >> 2
    q2_s = (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3
    q0_w = (2 * q1 + q0 + p1 + 2) >> 2
    p0_str = jnp.where(sp, p0_s3, p0_w)
    q0_str = jnp.where(sq, q0_s3, q0_w)

    p2o = jnp.where(sf & sp, p2_s, p2)
    p1o = jnp.where(sf & sp, p1_s, jnp.where(nf & ap, p1n, p1))
    p0o = jnp.where(sf, p0_str, jnp.where(nf, p0_n, p0))
    q0o = jnp.where(sf, q0_str, jnp.where(nf, q0_n, q0))
    q1o = jnp.where(sf & sq, q1_s, jnp.where(nf & aq, q1n, q1))
    q2o = jnp.where(sf & sq, q2_s, q2)
    return p2o, p1o, p0o, q0o, q1o, q2o


def _chroma_edge(samples, bs2, alpha, beta, tc0_row, strong, active):
    """One chroma edge for [W, 8] lines. bs2: per-line bS [W,8]
    (already expanded); tc0_row: tc0[bs] ([W,8])."""
    p1, p0, q0, q1 = samples
    a = alpha[:, None]
    b = beta[:, None]
    base = ((jnp.abs(p0 - q0) < a) & (jnp.abs(p1 - p0) < b)
            & (jnp.abs(q1 - q0) < b) & active[:, None])
    nf = base & (bs2 > 0) & ~strong[:, None]
    tc = tc0_row + 1
    delta = _clip3((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    p0_n = jnp.clip(p0 + delta, 0, 255)
    q0_n = jnp.clip(q0 - delta, 0, 255)
    sf = base & strong[:, None]
    p0_s = (2 * p1 + p0 + q1 + 2) >> 2
    q0_s = (2 * q1 + q0 + p1 + 2) >> 2
    p0o = jnp.where(sf, p0_s, jnp.where(nf, p0_n, p0))
    q0o = jnp.where(sf, q0_s, jnp.where(nf, q0_n, q0))
    return p0o, q0o


@functools.partial(jax.jit, static_argnames=("mbh", "mbw", "off_a",
                                              "off_b"))
def deblock_frame_device(y, u, v, intra, skip, nnz4, mv4, qp, qpc,
                         mbh: int, mbw: int, ref4=None,
                         qp_thresh: int = 15, trans8=None,
                         off_a: int = 0, off_b: int = 0):
    """Deblock one frame on device. y/u/v: int32 planes (MB-padded);
    intra/skip: [mbh,mbw]; nnz4: [4mbh,4mbw]; mv4: [4mbh,4mbw,2];
    qp/qpc traced — scalar, or per-MB [mbh,mbw] maps (adaptive
    quantization: MB edges use qPav = (QPp + QPq + 1) >> 1 per spec
    8.7.2.2, the deblock.cpp qp_map twin); ref4: optional [4mbh,4mbw]
    L0 refs (different-ref bS rule, spec 8.7.2.1); trans8: optional
    [mbh,mbw] transform_size_8x8 flags — internal 4x4-only luma edges
    (e = 1, 3) of those MBs are not transform edges and skip filtering
    (deblock.cpp / reference frame.c:627-811 High-profile rule);
    off_a/off_b: FilterOffsetA/B (2x the slice div2 values; indexA/B =
    qp + offset per spec 8.7.2.2, in-range by the tables' +-12
    margin). Returns filtered (y, u, v) uint8."""
    if ref4 is None:
        ref4 = jnp.zeros((4 * mbh, 4 * mbw), jnp.int32)
    if trans8 is None:
        trans8 = jnp.zeros((mbh, mbw), jnp.int32)
    ALPHA = jnp.asarray(ALPHA_TAB)
    BETA = jnp.asarray(BETA_TAB)
    TC0 = jnp.asarray(TC0_TAB)
    # scalar qp is the uniform special case of the per-MB grid
    # (qPav of equal QPs is the QP itself)
    qp_g = jnp.broadcast_to(jnp.asarray(qp), (mbh, mbw)) \
        .astype(jnp.int32)
    qpc_g = jnp.broadcast_to(jnp.asarray(qpc), (mbh, mbw)) \
        .astype(jnp.int32)
    qp_pm = jnp.pad(qp_g, 1)
    qpc_pm = jnp.pad(qpc_g, 1)

    PAD = 4
    yp = jnp.pad(y, PAD)
    up = jnp.pad(u, PAD)
    vp = jnp.pad(v, PAD)
    nzp = jnp.pad(nnz4, 1)
    mvp = jnp.pad(mv4, ((1, 1), (1, 1), (0, 0)))
    rfp = jnp.pad(ref4, 1)
    intra_p = jnp.pad(intra.astype(jnp.int32), 1)
    t8_p = jnp.pad(trans8.astype(jnp.int32), 1)

    mx_t, my_t, act_t = wave_tables(mbw, mbh)
    n_waves, W = mx_t.shape
    mx_t, my_t = jnp.asarray(mx_t), jnp.asarray(my_t)
    act_t = jnp.asarray(act_t)
    r20 = jnp.arange(20)
    r12 = jnp.arange(12)

    def body(d, st):
        yp, up, vp = st
        mx = jax.lax.dynamic_slice(mx_t, (d, 0), (1, W))[0]
        my = jax.lax.dynamic_slice(my_t, (d, 0), (1, W))[0]
        act = jax.lax.dynamic_slice(act_t, (d, 0), (1, W))[0]

        # tiles: luma [W,20,20] at (16my-4, 16mx-4) in padded coords
        ty0 = 16 * my            # padded row of (16my-4)+PAD
        tx0 = 16 * mx
        rows = ty0[:, None] + r20
        cols = tx0[:, None] + r20
        tile = yp[rows[:, :, None], cols[:, None, :]]
        cy0 = 8 * my
        cx0 = 8 * mx
        crows = cy0[:, None] + r12
        ccols = cx0[:, None] + r12
        tu = up[crows[:, :, None], ccols[:, None, :]]
        tv = vp[crows[:, :, None], ccols[:, None, :]]

        # per-MB context
        cur_i = intra_p[my + 1, mx + 1] > 0
        left_i = intra_p[my + 1, mx] > 0
        top_i = intra_p[my, mx + 1] > 0
        cur_skip = skip[my, mx] > 0
        cur_t8 = t8_p[my + 1, mx + 1] > 0
        # per-MB QP context (deblock.cpp deblock_mb): internal edges
        # use the MB's own QP; e==0 MB edges average with the
        # neighbour's (qPav). qp<=qp_thresh kills internal edges only
        # (reference frame.c:633); every edge re-checks its own
        # alpha/beta, so MB edges with a higher-QP qPav still filter.
        qp_w = qp_pm[my + 1, mx + 1]                        # [W]
        qpc_w = qpc_pm[my + 1, mx + 1]
        eqp_v = (qp_pm[my + 1, mx] + qp_w + 1) >> 1
        eqp_h = (qp_pm[my, mx + 1] + qp_w + 1) >> 1
        eqpc_v = (qpc_pm[my + 1, mx] + qpc_w + 1) >> 1
        eqpc_h = (qpc_pm[my, mx + 1] + qpc_w + 1) >> 1
        lowqp = qp_w <= qp_thresh
        # nnz/mv neighbourhood [W,5,5] at (4my-1, 4mx-1)
        n5r = (4 * my)[:, None] + jnp.arange(5)
        n5c = (4 * mx)[:, None] + jnp.arange(5)
        nz5 = nzp[n5r[:, :, None], n5c[:, None, :]]
        mv5 = mvp[n5r[:, :, None], n5c[:, None, :]]
        rf5 = rfp[n5r[:, :, None], n5c[:, None, :]]

        internal_on = act & ~cur_skip & ~lowqp

        def bs_groups(e, dir0: bool):
            """[W,4] bS for edge e's four 4-sample groups (bs_inter +
            the intra promotions of deblock_mb)."""
            if dir0:
                qn = nz5[:, 1:5, 1 + e]
                pn = nz5[:, 1:5, e]
                qmv = mv5[:, 1:5, 1 + e]
                pmv = mv5[:, 1:5, e]
                qrf = rf5[:, 1:5, 1 + e]
                prf = rf5[:, 1:5, e]
            else:
                qn = nz5[:, 1 + e, 1:5]
                pn = nz5[:, e, 1:5]
                qmv = mv5[:, 1 + e, 1:5]
                pmv = mv5[:, e, 1:5]
                qrf = rf5[:, 1 + e, 1:5]
                prf = rf5[:, e, 1:5]
            bs = jnp.where((qn > 0) | (pn > 0), 2, 0)
            mvd = (jnp.abs(qmv[..., 0] - pmv[..., 0]) >= 4) \
                | (jnp.abs(qmv[..., 1] - pmv[..., 1]) >= 4) \
                | (qrf != prf)
            bs = jnp.where((bs == 0) & mvd, 1, bs)
            nb_i = left_i if dir0 else top_i
            promote = cur_i | ((e == 0) & nb_i)
            return jnp.where(promote[:, None], 3, bs)

        def edge_active(e, dir0: bool):
            if e == 0:
                border = (mx > 0) if dir0 else (my > 0)
                return act & border
            if e in (1, 3):
                # 8x8-transform MBs: internal 4x4-only luma edges are
                # not transform edges (deblock.cpp trans8 rule; chroma
                # runs on even edges only, so this is luma-only)
                return internal_on & ~cur_t8
            return internal_on

        def edge_qp(e, dir0: bool):
            """(luma qp, chroma qp) for edge e: qPav on MB edges."""
            if e == 0:
                return (eqp_v, eqpc_v) if dir0 else (eqp_h, eqpc_h)
            return qp_w, qpc_w

        def strong_mask(e, dir0: bool):
            if e != 0:
                return jnp.zeros_like(cur_i)
            nb = left_i if dir0 else top_i
            return cur_i | nb

        # ---- luma vertical edges (filter along x) ----
        for e in range(4):
            col = 4 + 4 * e
            s = [tile[:, 4:20, col + k] for k in range(-4, 4)]
            bs4 = bs_groups(e, True)
            strong = strong_mask(e, True)
            eq, _ = edge_qp(e, True)
            a_e, b_e = ALPHA[eq + off_a + 12], BETA[eq + off_b + 12]
            activ = edge_active(e, True) & (a_e > 0) & (b_e > 0)
            tcrow = TC0[(eq + off_a + 12)[:, None],
                        jnp.clip(jnp.repeat(bs4, 4, 1), 0, 3)]
            p2o, p1o, p0o, q0o, q1o, q2o = _luma_edge(
                tuple(s), bs4, a_e, b_e, tcrow, strong, activ)
            tile = tile.at[:, 4:20, col - 3].set(p2o)
            tile = tile.at[:, 4:20, col - 2].set(p1o)
            tile = tile.at[:, 4:20, col - 1].set(p0o)
            tile = tile.at[:, 4:20, col + 0].set(q0o)
            tile = tile.at[:, 4:20, col + 1].set(q1o)
            tile = tile.at[:, 4:20, col + 2].set(q2o)
        # ---- luma horizontal edges (filter along y) ----
        for e in range(4):
            row = 4 + 4 * e
            s = [tile[:, row + k, 4:20] for k in range(-4, 4)]
            bs4 = bs_groups(e, False)
            strong = strong_mask(e, False)
            eq, _ = edge_qp(e, False)
            a_e, b_e = ALPHA[eq + off_a + 12], BETA[eq + off_b + 12]
            activ = edge_active(e, False) & (a_e > 0) & (b_e > 0)
            tcrow = TC0[(eq + off_a + 12)[:, None],
                        jnp.clip(jnp.repeat(bs4, 4, 1), 0, 3)]
            p2o, p1o, p0o, q0o, q1o, q2o = _luma_edge(
                tuple(s), bs4, a_e, b_e, tcrow, strong, activ)
            tile = tile.at[:, row - 3, 4:20].set(p2o)
            tile = tile.at[:, row - 2, 4:20].set(p1o)
            tile = tile.at[:, row - 1, 4:20].set(p0o)
            tile = tile.at[:, row + 0, 4:20].set(q0o)
            tile = tile.at[:, row + 1, 4:20].set(q1o)
            tile = tile.at[:, row + 2, 4:20].set(q2o)
        # ---- chroma (even edges only; ALL vertical edges before any
        # horizontal one — the C++ runs chroma inside the per-direction
        # edge loop, so V(e0), V(e2), then H(e0), H(e2)). The C++ gates
        # each edge's chroma on the LUMA edge alpha/beta ("if (!a_l ||
        # !b_l) continue"); the chroma alpha self-disables via the
        # filter's base conditions when zero. ----
        for e in (0, 2):
            bs4v = bs_groups(e, True)
            strongv = strong_mask(e, True)
            eq, eqc = edge_qp(e, True)
            a_le, b_le = ALPHA[eq + off_a + 12], BETA[eq + off_b + 12]
            a_ce, b_ce = ALPHA[eqc + off_a + 12], BETA[eqc + off_b + 12]
            activv = edge_active(e, True) & (a_le > 0) & (b_le > 0)
            bs8 = jnp.repeat(bs4v, 2, 1)
            tcv = TC0[(eqc + off_a + 12)[:, None], jnp.clip(bs8, 0, 3)]
            col = 4 + 2 * e
            for plane_i in range(2):
                t = tu if plane_i == 0 else tv
                s = [t[:, 4:12, col + k] for k in range(-2, 2)]
                p0o, q0o = _chroma_edge(
                    tuple(s), bs8, a_ce, b_ce, tcv, strongv, activv)
                t = t.at[:, 4:12, col - 1].set(p0o)
                t = t.at[:, 4:12, col + 0].set(q0o)
                if plane_i == 0:
                    tu = t
                else:
                    tv = t
        for e in (0, 2):
            bs4h = bs_groups(e, False)
            strongh = strong_mask(e, False)
            eq, eqc = edge_qp(e, False)
            a_le, b_le = ALPHA[eq + off_a + 12], BETA[eq + off_b + 12]
            a_ce, b_ce = ALPHA[eqc + off_a + 12], BETA[eqc + off_b + 12]
            activh = edge_active(e, False) & (a_le > 0) & (b_le > 0)
            bs8h = jnp.repeat(bs4h, 2, 1)
            tch = TC0[(eqc + off_a + 12)[:, None], jnp.clip(bs8h, 0, 3)]
            row = 4 + 2 * e
            for plane_i in range(2):
                t = tu if plane_i == 0 else tv
                s = [t[:, row + k, 4:12] for k in range(-2, 2)]
                p0o, q0o = _chroma_edge(
                    tuple(s), bs8h, a_ce, b_ce, tch, strongh, activh)
                t = t.at[:, row - 1, 4:12].set(p0o)
                t = t.at[:, row + 0, 4:12].set(q0o)
                if plane_i == 0:
                    tu = t
                else:
                    tv = t

        # scatter tiles back (same-wave tiles are disjoint)
        srows = jnp.where(act[:, None], rows, yp.shape[0] + 1)
        yp = yp.at[srows[:, :, None], cols[:, None, :]].set(
            tile, mode="drop")
        scrows = jnp.where(act[:, None], crows, up.shape[0] + 1)
        up = up.at[scrows[:, :, None], ccols[:, None, :]].set(
            tu, mode="drop")
        vp = vp.at[scrows[:, :, None], ccols[:, None, :]].set(
            tv, mode="drop")
        return yp, up, vp

    yp, up, vp = jax.lax.fori_loop(0, n_waves, body, (yp, up, vp))
    H, Wd = y.shape
    Hc, Wc = u.shape
    return (yp[PAD:PAD + H, PAD:PAD + Wd].astype(jnp.uint8),
            up[PAD:PAD + Hc, PAD:PAD + Wc].astype(jnp.uint8),
            vp[PAD:PAD + Hc, PAD:PAD + Wc].astype(jnp.uint8))
