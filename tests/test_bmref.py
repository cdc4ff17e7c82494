"""Multi-ref B lists (x264 --ref N with --bframes).

Reference model: x264_mb_analyse_inter_b16x16 (analyse.c:1983+,
"16x16 Search on all ref frame"): per-MB L0 ME over every DPB entry
with REF_COST = lambda * te(ref) bits; the winning (ref, mv) is reused
by the 16x16 L0/BI modes. Syntax: ref_idx_l0 te(v) / CABAC ctx 54
before the mvds (spec 7.3.5.1), slice-header num_ref_idx override with
the EFFECTIVE past-ref count, one extra SPS DPB slot so the future
anchor doesn't evict a still-referenced past anchor (the set.c
pyramid-slot trick). Spatial direct is ref-aware on both sides
(min-positive over neighbour refs, spec 8.4.1.2.2).

B partitions ride multi-ref too: the per-MB L0 ref is the 16x16
REF_COST winner reused by every shape (the analyse.c:1973 model —
b16x8 loads p_fref[0][a->l0.i_ref]); see test_bmref_partitions*.
"""

import numpy as np
import pytest

from video_steganography_pcamv_tpu.params import Params
from video_steganography_pcamv_tpu.utils.yuv import Frame
from video_steganography_pcamv_tpu.encoder.core import Encoder
from video_steganography_pcamv_tpu.decoder import decode_annexb

W, H = 128, 96


def _anchor_flicker(n, seed=9):
    """Panning detail; every other ANCHOR (display 3, 9, ...) carries
    an inverted band, so B MBs in the band match L0 ref 1 (the 2-GOP-
    old anchor) far better than ref 0."""
    rng = np.random.RandomState(seed)
    pad = 48
    base = rng.randint(0, 256, (H + 2 * pad, W + 2 * pad)) \
        .astype(np.uint8)
    base = ((base.astype(np.int32) + np.roll(base, 1, 0)
             + np.roll(base, 1, 1)) // 3).astype(np.uint8)
    out = []
    for i in range(n):
        y = base[pad + i:pad + i + H, pad + 2 * i:pad + 2 * i + W] \
            .copy()
        if i % 6 == 3:     # anchors at 0,3,6,... -> flash 3, 9, ...
            y[24:56, :] = 255 - y[24:56, :]
        u = np.full((H // 2, W // 2), 100, np.uint8)
        out.append(Frame(y, u, np.full((H // 2, W // 2), 140,
                                       np.uint8)))
    return out


@pytest.mark.parametrize("cabac", [False, True])
def test_bmref_roundtrip_bitexact(cabac):
    frames = _anchor_flicker(9)
    p = Params(width=W, height=H, qp=26, me_range=8, ref_frames=3,
               bframes=2, b_adapt=0, cabac=cabac)
    enc = Encoder(p)
    enc.keep_recon = True
    bs = b"".join(enc.encode_frame(f) for f in frames) + enc.flush()
    dec = decode_annexb(bs)
    assert len(dec) == 9
    for i, d in enumerate(dec):
        ry = enc.recon_by_disp[i][0][:H, :W].astype(np.uint8)
        np.testing.assert_array_equal(d.y, ry, err_msg=f"frame {i}")
        ru = enc.recon_by_disp[i][1][:H // 2, :W // 2] \
            .astype(np.uint8)
        np.testing.assert_array_equal(d.u, ru, err_msg=f"frame {i} U")
    # B frames must actually appear
    assert any(d.slice_type in (1, 6) for d in dec)


def test_bmref_picks_older_ref():
    """In the flashed band, B L0 MBs must choose ref > 0 (the clean
    2-GOP-old anchor) — the point of the ref sweep."""
    frames = _anchor_flicker(11, seed=13)
    p = Params(width=W, height=H, qp=26, me_range=8, ref_frames=3,
               bframes=2, b_adapt=0)
    enc = Encoder(p)
    fracs = []
    for i, f in enumerate(frames):
        enc.encode_frame(f)
        r = getattr(enc, "_last_b_ref0", None)
        if r is not None and i >= 6:
            fracs.append(float((r > 0).mean()))
            enc._last_b_ref0 = None
    assert fracs, "no multi-ref B frames encoded"
    assert max(fracs) > 0.05, f"no B MB ever chose ref > 0: {fracs}"


def test_bmref_beats_singleref_b():
    """Multi-ref B must win RD on anchor-flicker content."""
    frames = _anchor_flicker(9, seed=21)
    outs = {}
    for r in (1, 3):
        p = Params(width=W, height=H, qp=28, me_range=8, ref_frames=r,
                   bframes=2, b_adapt=0, psnr=True)
        enc = Encoder(p)
        enc.keep_recon = True
        nbits = sum(len(enc.encode_frame(f)) for f in frames)
        nbits += len(enc.flush())
        sse = 0
        for i, f in enumerate(frames):
            ry = enc.recon_by_disp[i][0][:H, :W].astype(np.int64)
            sse += int(np.sum((ry - f.y.astype(np.int64)) ** 2))
        outs[r] = (nbits, sse)
    bits1, sse1 = outs[1]
    bits3, sse3 = outs[3]
    # accept either axis winning while the other doesn't regress much
    assert (bits3 < bits1 and sse3 < sse1 * 1.05) \
        or (sse3 < sse1 and bits3 < bits1 * 1.05), outs


def test_bmref_with_aq():
    """Multi-ref B + AQ: per-MB QP through the mref bipred encode."""
    frames = _anchor_flicker(6, seed=17)
    p = Params(width=W, height=H, qp=29, me_range=8, ref_frames=2,
               bframes=1, b_adapt=0, aq_mode=1, aq_strength=1.5,
               cabac=True)
    enc = Encoder(p)
    enc.keep_recon = True
    bs = b"".join(enc.encode_frame(f) for f in frames) + enc.flush()
    dec = decode_annexb(bs)
    assert len(dec) == 6
    for i, d in enumerate(dec):
        ry = enc.recon_by_disp[i][0][:H, :W].astype(np.uint8)
        np.testing.assert_array_equal(d.y, ry, err_msg=f"frame {i}")


@pytest.mark.parametrize("cabac", [False, True])
def test_bmref_with_weightb(cabac):
    """Multi-ref B + implicit weighted bipred: the weight follows the
    L0 ref each MB actually uses (x264
    h->mb.bipred_weight[i_ref0][i_ref1]; spec 8.4.2.3.2 POC-distance
    derivation per ACTUAL ref)."""
    frames = _anchor_flicker(9, seed=27)
    p = Params(width=W, height=H, qp=26, me_range=8, ref_frames=3,
               bframes=2, b_adapt=0, weightb=True, cabac=cabac)
    p.validate()
    enc = Encoder(p)
    enc.keep_recon = True
    bs = b"".join(enc.encode_frame(f) for f in frames) + enc.flush()
    dec = decode_annexb(bs)
    assert len(dec) == 9
    for i, d in enumerate(dec):
        ry = enc.recon_by_disp[i][0][:H, :W].astype(np.uint8)
        np.testing.assert_array_equal(d.y, ry, err_msg=f"frame {i}")
        ru = enc.recon_by_disp[i][1][:H // 2, :W // 2] \
            .astype(np.uint8)
        np.testing.assert_array_equal(d.u, ru, err_msg=f"frame {i} U")


@pytest.mark.parametrize("direct", [2, 3])
def test_bmref_temporal_direct(direct):
    """Temporal (and auto) direct under multi-ref B: refIdxL0 = the
    colocated ref through the identity map_col_to_list0 (the B's L0
    IS the colocated anchor's L0), per-ref DistScaleFactors, per-8x8
    direct refs through MC on both sides."""
    frames = _anchor_flicker(9, seed=33)
    p = Params(width=W, height=H, qp=26, me_range=8, ref_frames=3,
               bframes=2, b_adapt=0, cabac=True, direct=direct)
    p.validate()
    enc = Encoder(p)
    enc.keep_recon = True
    bs = b"".join(enc.encode_frame(f) for f in frames) + enc.flush()
    dec = decode_annexb(bs)
    assert len(dec) == 9
    for i, d in enumerate(dec):
        ry = enc.recon_by_disp[i][0][:H, :W].astype(np.uint8)
        np.testing.assert_array_equal(d.y, ry, err_msg=f"frame {i}")
        ru = enc.recon_by_disp[i][1][:H // 2, :W // 2] \
            .astype(np.uint8)
        np.testing.assert_array_equal(d.u, ru, err_msg=f"frame {i} U")


def test_temporal_fields_multiref_unit():
    """temporal_direct_fields with a per-ref DSF table: refs follow
    the colocated field, each block scales by ITS ref's factor,
    colocated intra falls back to ref 0 / zero MVs, availability is
    total (every colocated ref has an L0 image under the identity
    map)."""
    from video_steganography_pcamv_tpu.encoder.bslice import (
        temporal_direct_fields)
    mbh = mbw = 1
    col_mv4 = np.zeros((4, 4, 2), np.int32)
    col_ref4 = np.zeros((4, 4), np.int32)
    # 8x8 z-blocks via corner cells (0,0),(0,3),(3,0),(3,3)
    col_mv4[0, 0] = (8, 4)     # ref 0
    col_ref4[0, 3] = 1         # ref 1, different scale
    col_mv4[0, 3] = (8, 4)
    col_ref4[3, 0] = -1        # colocated intra
    col_mv4[3, 0] = (100, 100)
    col_ref4[3, 3] = 2
    col_mv4[3, 3] = (-6, 10)
    dsf = np.array([128, 256, 64], np.int64)   # per-L0-entry
    avail, mv0, mv1, ref8 = temporal_direct_fields(col_mv4, col_ref4,
                                                   dsf)
    assert avail.all()
    np.testing.assert_array_equal(ref8, [[0, 1], [0, 2]])
    # block (0,0): dsf 128 -> mv0 = (mv*128+128)>>8 = mv/2
    np.testing.assert_array_equal(mv0[0, 0], [4, 2])
    np.testing.assert_array_equal(mv1[0, 0], [4 - 8, 2 - 4])
    # block (0,1): dsf 256 -> mv0 = mv, mv1 = 0
    np.testing.assert_array_equal(mv0[0, 1], [8, 4])
    np.testing.assert_array_equal(mv1[0, 1], [0, 0])
    # block (1,0): colocated intra -> zeros, ref 0
    np.testing.assert_array_equal(mv0[1, 0], [0, 0])
    np.testing.assert_array_equal(mv1[1, 0], [0, 0])
    # block (1,1): dsf 64 -> mv0 = (mv*64+128)>>8
    np.testing.assert_array_equal(
        mv0[1, 1], [(-6 * 64 + 128) >> 8, (10 * 64 + 128) >> 8])


@pytest.mark.parametrize("cabac,direct", [(False, 1), (True, 1),
                                          (True, 2)])
def test_bmref_partitions(cabac, direct):
    """B partitions under multi-ref L0: the per-MB 16x16 REF_COST
    winner feeds every shape (analyse.c a->l0.i_ref), ref_idx_l0 per
    L0-using partition unit (te(v)/ctx-54, refs before mvds),
    per-unit ref-aware MVPs, direct subs at derived refs. The full B
    MB zoo must appear and the stream decode bit-exactly."""
    frames = _anchor_flicker(9, seed=39)
    # add split motion so partitions actually win
    for i, f in enumerate(frames):
        f.y[60:96, 40 + 3 * i:76 + 3 * i] = \
            frames[0].y[:36, :36]
    p = Params(width=W, height=H, qp=26, me_range=8, ref_frames=3,
               bframes=2, b_adapt=0, cabac=cabac, direct=direct)
    p.validate()
    enc = Encoder(p)
    enc.keep_recon = True
    bs = b"".join(enc.encode_frame(f) for f in frames) + enc.flush()
    dec = decode_annexb(bs)
    assert len(dec) == 9
    kinds = set()
    for i, d in enumerate(dec):
        if d.slice_type in (1, 6):
            kinds |= {m.mb_type for m in d.mbs}
        ry = enc.recon_by_disp[i][0][:H, :W].astype(np.uint8)
        np.testing.assert_array_equal(d.y, ry, err_msg=f"frame {i}")
        ru = enc.recon_by_disp[i][1][:H // 2, :W // 2] \
            .astype(np.uint8)
        np.testing.assert_array_equal(d.u, ru, err_msg=f"frame {i} U")
    assert {"B16x8", "B8x16", "B8x8"} & kinds, kinds
    # the ref sweep must pick ref > 0 somewhere
    r = getattr(enc, "_last_b_ref0", None)
    assert r is not None


def test_bmref_partitions_weightb_intra():
    """Partitions + multi-ref + weightb + intra-in-B together."""
    frames = _anchor_flicker(9, seed=41)
    for i, f in enumerate(frames):
        f.y[60:96, 40 + 3 * i:76 + 3 * i] = frames[0].y[:36, :36]
    p = Params(width=W, height=H, qp=26, me_range=8, ref_frames=2,
               bframes=2, b_adapt=0, cabac=True, weightb=True)
    p.validate()
    enc = Encoder(p)
    enc.keep_recon = True
    bs = b"".join(enc.encode_frame(f) for f in frames) + enc.flush()
    dec = decode_annexb(bs)
    for i, d in enumerate(dec):
        ry = enc.recon_by_disp[i][0][:H, :W].astype(np.uint8)
        np.testing.assert_array_equal(d.y, ry, err_msg=f"frame {i}")
