"""High-profile 8x8 end-to-end: --8x8dct I frames must decode
bit-exactly (High SPS + PPS transform flag, i8x8 prediction, interleaved
CAVLC, trans8 deblock rule), and IPPP streams must stay consistent."""

import numpy as np
import pytest

from video_steganography_pcamv_tpu.params import Params, StegoParams
from video_steganography_pcamv_tpu.utils.yuv import Frame, synthetic_sequence
from video_steganography_pcamv_tpu.encoder.core import Encoder
from video_steganography_pcamv_tpu.decoder import decode_annexb

W, H = 128, 96


def _smooth_frames(n, seed=0):
    """Gradient + sine content: favours i8x8 over i4x4."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    out = []
    for i in range(n):
        base = (40 + 0.8 * xx + 0.5 * yy
                + 14 * np.sin((xx + 3 * i) / 9.0)
                * np.cos((yy + 2 * i) / 13.0))
        y = np.clip(base + rng.randn(H, W) * 2, 0, 255).astype(np.uint8)
        out.append(Frame(y, np.full((H // 2, W // 2), 100, np.uint8),
                         np.full((H // 2, W // 2), 140, np.uint8)))
    return out


@pytest.mark.parametrize("deblock", [True, False])
def test_i_frame_8x8_bitexact(deblock):
    f = _smooth_frames(1, seed=4)[0]
    p = Params(width=W, height=H, qp=26, transform_8x8=True,
               deblock=deblock)
    enc = Encoder(p)
    bs = enc.encode_frame(f)
    dec = decode_annexb(bs)
    kinds = {m.mb_type for m in dec[0].mbs}
    assert "I8x8" in kinds, kinds
    ry = np.asarray(enc.recon_prev[0])[:H, :W].astype(np.uint8)
    np.testing.assert_array_equal(dec[0].y, ry)
    np.testing.assert_array_equal(
        dec[0].u,
        np.asarray(enc.recon_prev[1])[:H // 2, :W // 2].astype(np.uint8))


def test_ippp_8x8_with_stego_roundtrip():
    from video_steganography_pcamv_tpu.stego.extract import (
        extract_from_stream)
    frames = _smooth_frames(5, seed=7)
    p = Params(width=W, height=H, qp=26, me_range=8, transform_8x8=True,
               stego=StegoParams(em_rate=16.0, key=3))
    enc = Encoder(p)
    enc.keep_recon = True
    bs = b"".join(enc.encode_frame(f) for f in frames)
    dec = decode_annexb(bs)
    assert len(dec) == 5
    for i, d in enumerate(dec):
        ry = enc.recon_by_disp[i][0][:H, :W].astype(np.uint8)
        np.testing.assert_array_equal(d.y, ry, err_msg=f"frame {i}")
    got = extract_from_stream(bs, em_rate=16.0, key=3)
    sent = enc._stego.sent_messages
    assert len(got) == len(sent)
    for g, s in zip(got, sent):
        np.testing.assert_array_equal(g, s)


def _pan_frames(n, seed=2, step=2):
    rng = np.random.RandomState(seed)
    pad = 40
    a = rng.randint(20, 236, (H + 2 * pad, W + 2 * pad)).astype(np.uint8)
    for _ in range(3):
        a = ((a.astype(np.int32) + np.roll(a, 1, 0) + np.roll(a, 1, 1)
              + np.roll(np.roll(a, 1, 0), 1, 1)) // 4).astype(np.uint8)
    out = []
    for i in range(n):
        s = step * i
        yp = np.ascontiguousarray(a[pad + s:pad + s + H,
                                    pad + 2 * s:pad + 2 * s + W])
        out.append(Frame(yp, np.full((H // 2, W // 2), 110, np.uint8),
                         np.full((H // 2, W // 2), 140, np.uint8)))
    return out


def test_inter_8x8_adaptive_transform_bitexact():
    """P frames choose the 8x8 transform adaptively (sa8d < satd,
    analyse.c:2291) and must decode bit-exactly, with stego on top."""
    frames = _pan_frames(5)
    p = Params(width=W, height=H, qp=27, me_range=8, transform_8x8=True,
               stego=StegoParams(em_rate=16.0, key=3))
    enc = Encoder(p)
    enc.keep_recon = True
    bs = b"".join(enc.encode_frame(f) for f in frames)
    dec = decode_annexb(bs)
    assert len(dec) == 5
    for i, d in enumerate(dec):
        ry = enc.recon_by_disp[i][0][:H, :W].astype(np.uint8)
        np.testing.assert_array_equal(d.y, ry, err_msg=f"frame {i}")
    from video_steganography_pcamv_tpu.stego.extract import (
        extract_from_stream)
    got = extract_from_stream(bs, em_rate=16.0, key=3)
    sent = enc._stego.sent_messages
    assert len(got) == len(sent)
    for g, s in zip(got, sent):
        np.testing.assert_array_equal(g, s)
