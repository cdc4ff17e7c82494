"""B slices end-to-end (IBBP GOPs).

Reference model: the B path of x264_macroblock_analyse
(analyse.c:3110-3466), spatial direct (spec 8.4.1.2.2 with
direct_8x8_inference), frame reordering (encoder.c:2179-2228), POC
type 0 output ordering, and the B_SKIP/mb_type syntax (spec 7.4.5).
Scope per bslice.py: 16x16-granularity B modes, non-reference B,
CAVLC, deblock off on B slices.
"""

import numpy as np
import pytest

from video_steganography_pcamv_tpu.params import Params, StegoParams
from video_steganography_pcamv_tpu.utils.yuv import Frame
from video_steganography_pcamv_tpu.encoder.core import Encoder
from video_steganography_pcamv_tpu.decoder import decode_annexb

W, H = 96, 64


def _pan_frames(w, h, n, seed=0, step=2):
    """Smooth panning texture: B frames should interpolate well."""
    rng = np.random.RandomState(seed)
    pad = 4 * n + 16
    a = rng.randint(20, 236, (h + 2 * pad, w + 2 * pad)).astype(np.uint8)
    for _ in range(2):
        a = ((a.astype(np.int32) + np.roll(a, 1, 0) + np.roll(a, 1, 1)
              + np.roll(np.roll(a, 1, 0), 1, 1)) // 4).astype(np.uint8)
    u = np.full((h // 2, w // 2), 110, np.uint8)
    v = np.full((h // 2, w // 2), 140, np.uint8)
    out = []
    for i in range(n):
        s = step * i
        yp = a[pad + s:pad + s + h, pad + 2 * s:pad + 2 * s + w]
        out.append(Frame(np.ascontiguousarray(yp), u.copy(), v.copy()))
    return out


def _encode_all(enc, frames):
    bs = b""
    for f in frames:
        bs += enc.encode_frame(f)
    bs += enc.flush()
    return bs


@pytest.mark.parametrize("bframes,cabac", [(1, False), (2, False),
                                           (1, True), (2, True)])
def test_b_roundtrip_bitexact(bframes, cabac):
    n = 6
    frames = _pan_frames(W, H, n, seed=1)
    p = Params(width=W, height=H, qp=28, me_range=4, bframes=bframes,
               cabac=cabac)
    enc = Encoder(p)
    enc.keep_recon = True
    bs = _encode_all(enc, frames)
    dec = decode_annexb(bs)
    assert len(dec) == n
    # decode_annexb returns display order (POC sort)
    types = [d.slice_type for d in dec]
    assert 1 in types, f"no B slices in {types}"
    for i, d in enumerate(dec):
        ry, ru, rv = enc.recon_by_disp[i]
        np.testing.assert_array_equal(
            d.y, ry[:H, :W].astype(np.uint8), err_msg=f"frame {i} luma")
        np.testing.assert_array_equal(
            d.u, ru[:H // 2, :W // 2].astype(np.uint8),
            err_msg=f"frame {i} U")
        np.testing.assert_array_equal(
            d.v, rv[:H // 2, :W // 2].astype(np.uint8),
            err_msg=f"frame {i} V")


def test_b_quality_sane():
    """B recon quality must be in the same league as the sources'
    P-only encode at the same QP (sanity of bipred/direct paths)."""
    n = 7
    frames = _pan_frames(W, H, n, seed=3)
    p = Params(width=W, height=H, qp=26, me_range=4, bframes=2)
    enc = Encoder(p)
    enc.keep_recon = True
    _encode_all(enc, frames)
    for i, f in enumerate(frames):
        ry = enc.recon_by_disp[i][0][:H, :W].astype(np.int64)
        mse = np.mean((ry - f.y.astype(np.int64)) ** 2)
        psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
        assert psnr > 30.0, f"frame {i} psnr {psnr:.2f}"


def test_b_skip_and_reorder():
    """Static content: B frames should be mostly B_SKIP, stream must
    carry frame pattern I P B (decode) -> I B P (display)."""
    frames = _pan_frames(W, H, 3, seed=5, step=0)   # static
    p = Params(width=W, height=H, qp=30, me_range=4, bframes=1)
    enc = Encoder(p)
    bs = _encode_all(enc, frames)
    dec = decode_annexb(bs)
    assert [d.slice_type for d in dec] == [7, 1, 0] or \
        [d.slice_type for d in dec] == [2, 1, 0]
    b = dec[1]
    n_skip = sum(1 for m in b.mbs if m.mb_type == "BSKIP")
    assert n_skip > 0.8 * len(b.mbs), f"{n_skip}/{len(b.mbs)} B_SKIP"


def test_b_stego_roundtrip():
    """Stego covers live only in the P anchors; blind extraction must
    still work with B frames interleaved."""
    from video_steganography_pcamv_tpu.stego.extract import (
        extract_from_stream)
    n = 7
    frames = _pan_frames(W, H, n, seed=7)
    p = Params(width=W, height=H, qp=26, me_range=4, bframes=1,
               stego=StegoParams(em_rate=16.0, key=9))
    enc = Encoder(p)
    bs = _encode_all(enc, frames)
    got = extract_from_stream(bs, em_rate=16.0, key=9)
    sent = enc._stego.sent_messages
    assert len(got) == len(sent) > 0
    for g, s in zip(got, sent):
        np.testing.assert_array_equal(g, s)


def test_b_adapt_closes_gop():
    """A mid-sequence content change (below the scenecut bar) must pull
    the anchor forward under b_adapt: the hard frame is coded P, not B."""
    rng = np.random.RandomState(9)
    pad = 24
    a = rng.randint(20, 236, (H + 2 * pad, W + 2 * pad)).astype(np.uint8)
    b2 = rng.randint(20, 236, (H + 2 * pad, W + 2 * pad)).astype(np.uint8)
    for _ in range(2):
        a = ((a.astype(np.int32) + np.roll(a, 1, 0) + np.roll(a, 1, 1)
              + np.roll(np.roll(a, 1, 0), 1, 1)) // 4).astype(np.uint8)
        b2 = ((b2.astype(np.int32) + np.roll(b2, 1, 0) + np.roll(b2, 1, 1)
               + np.roll(np.roll(b2, 1, 0), 1, 1)) // 4).astype(np.uint8)
    u = np.full((H // 2, W // 2), 128, np.uint8)
    frames = []
    for i in range(6):
        src = a if i < 2 else b2   # content switch mid-GOP (frame 2)
        s = i if i < 2 else i - 2
        yp = src[pad + s:pad + s + H, pad + 2 * s:pad + 2 * s + W]
        frames.append(Frame(np.ascontiguousarray(yp), u.copy(), u.copy()))

    types = {}
    for adapt in (0, 1):
        p = Params(width=W, height=H, qp=28, me_range=4, bframes=2,
                   b_adapt=adapt, scenecut_threshold=0, keyint_max=250)
        enc = Encoder(p)
        bs = _encode_all(enc, frames)
        dec = decode_annexb(bs)
        assert len(dec) == 6
        types[adapt] = [d.slice_type for d in dec]
    # fixed cadence codes frame 2 as B; adaptive must anchor it as P
    assert types[1] != types[0], types
    assert types[1][2] in (0, 5), types


def test_b_with_multiref_p():
    """--bframes + --ref 2: P anchors search the full DPB while B
    frames ride between anchors; blind stego extraction intact."""
    from video_steganography_pcamv_tpu.stego.extract import (
        extract_from_stream)
    n = 7
    frames = _pan_frames(W, H, n, seed=13)
    p = Params(width=W, height=H, qp=26, me_range=4, bframes=1,
               ref_frames=2,
               stego=StegoParams(em_rate=16.0, key=11))
    enc = Encoder(p)
    enc.keep_recon = True
    bs = _encode_all(enc, frames)
    dec = decode_annexb(bs)
    assert len(dec) == n
    assert 1 in [d.slice_type for d in dec]
    for i, d in enumerate(dec):
        ry = enc.recon_by_disp[i][0]
        np.testing.assert_array_equal(
            d.y, ry[:H, :W].astype(np.uint8), err_msg=f"frame {i}")
    got = extract_from_stream(bs, em_rate=16.0, key=11)
    sent = enc._stego.sent_messages
    assert len(got) == len(sent) > 0
    for g, s in zip(got, sent):
        np.testing.assert_array_equal(g, s)


@pytest.mark.parametrize("cabac", [False, True])
def test_b_p4x4_roundtrip_bitexact(cabac):
    """p4x4 + bframes: spatial-direct colocated checks read the
    anchor's TRUE per-4x4 motion field (sub-8x8 anchors must not
    coarsen it to 8x8 granularity, or decoded B frames diverge)."""
    n = 5
    frames = _pan_frames(W, H, n, seed=11, step=3)
    p = Params(width=W, height=H, qp=27, me_range=4, bframes=1,
               cabac=cabac, p4x4=True)
    enc = Encoder(p)
    enc.keep_recon = True
    bs = _encode_all(enc, frames)
    dec = decode_annexb(bs)
    assert len(dec) == n
    types = [d.slice_type for d in dec]
    assert 1 in types, f"no B slices in {types}"
    for i, d in enumerate(dec):
        ry, ru, rv = enc.recon_by_disp[i]
        np.testing.assert_array_equal(
            d.y, ry[:H, :W].astype(np.uint8), err_msg=f"frame {i} luma")
        np.testing.assert_array_equal(
            d.u, ru[:H // 2, :W // 2].astype(np.uint8),
            err_msg=f"frame {i} U")


def test_qpfile_honored_in_b_pipe(tmp_path):
    """--qpfile forced types/QPs steer the B pipeline too (was a
    documented divergence: qpfile only applied to the IPP path)."""
    from video_steganography_pcamv_tpu.decoder import decode_annexb
    qpf = tmp_path / "qpf.txt"
    qpf.write_text("0 I 30\n1 B 36\n2 P 33\n3 B 35\n4 P 31\n5 B 34\n")
    frames = _pan_frames(W, H, 6, seed=1)
    p = Params(width=W, height=H, qp=28, me_range=4, bframes=2,
               qpfile=str(qpf))
    enc = Encoder(p)
    enc.keep_recon = True
    bs = _encode_all(enc, frames)
    dec = decode_annexb(bs)
    got = [d.mbs[0].qp for d in dec]
    assert got == [30, 36, 33, 35, 31, 34], got
    for i, d in enumerate(dec):
        ry = enc.recon_by_disp[i][0][:H, :W].astype(np.uint8)
        np.testing.assert_array_equal(d.y, ry, err_msg=f"frame {i}")


def _split_motion_frames(w, h, n, yb=24, xb=40, seed=7, step=3):
    """Three regions with different motion, boundaries mid-MB: forces
    B 16x8/8x16/8x8 partition decisions."""
    rng = np.random.RandomState(seed)
    pad = step * n + 16
    a = rng.randint(16, 240, (h + 2 * pad, w + 2 * pad)).astype(np.uint8)
    for _ in range(2):
        a = ((a.astype(np.int32) + np.roll(a, 1, 0) + np.roll(a, 1, 1)
              + np.roll(np.roll(a, 1, 0), 1, 1)) // 4).astype(np.uint8)
    u = np.full((h // 2, w // 2), 110, np.uint8)
    v = np.full((h // 2, w // 2), 140, np.uint8)
    out = []
    for i in range(n):
        s = step * i
        y = np.empty((h, w), np.uint8)
        y[:yb] = a[pad:pad + yb, pad + s:pad + s + w]
        y[yb:, :xb] = a[pad + yb + s:pad + h + s, pad:pad + xb]
        y[yb:, xb:] = a[pad + yb:pad + h, pad - s + xb:pad - s + w]
        out.append(Frame(y, u.copy(), v.copy()))
    return out


@pytest.mark.parametrize("cabac", [False, True])
def test_b_partitions_roundtrip(cabac):
    """B partition MBs (16x8/8x16/B_8x8 incl. direct subs) must be
    chosen on split-motion content and decode bit-exactly in both
    entropy modes (spec Tables 7-14/7-18; reference
    analyse.c:3110-3466 B partition analysis)."""
    n = 5
    frames = _split_motion_frames(W, H, n)
    p = Params(width=W, height=H, qp=26, me_range=12, bframes=1,
               cabac=cabac)
    enc = Encoder(p)
    enc.keep_recon = True
    bs = _encode_all(enc, frames)
    dec = decode_annexb(bs)
    assert len(dec) == n
    kinds = set()
    for d in dec:
        if d.slice_type == 1:
            kinds |= {m.mb_type for m in d.mbs}
    assert kinds & {"B16x8", "B8x16", "B8x8"}, \
        f"no B partition MBs chosen: {kinds}"
    for i, d in enumerate(dec):
        ry, ru, rv = enc.recon_by_disp[i]
        np.testing.assert_array_equal(
            d.y, ry[:H, :W].astype(np.uint8), err_msg=f"frame {i} luma")
        np.testing.assert_array_equal(
            d.u, ru[:H // 2, :W // 2].astype(np.uint8),
            err_msg=f"frame {i} U")
        np.testing.assert_array_equal(
            d.v, rv[:H // 2, :W // 2].astype(np.uint8),
            err_msg=f"frame {i} V")
