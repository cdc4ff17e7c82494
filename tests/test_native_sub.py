"""Native sub-8x8 entropy twins: the C++ writers must produce the same
bytes as the Python oracle writers on a --p4x4 stream (both CAVLC and
CABAC), and the streams must decode bit-exactly.

Reference syntax: spec 7.3.5.2 sub_mb_type + per-unit mvds;
x264_cabac_mb_sub_p_partition (encoder/cabac.c:309-330).
"""

import numpy as np
import pytest

from video_steganography_pcamv_tpu.params import Params
from video_steganography_pcamv_tpu.utils.yuv import Frame
from video_steganography_pcamv_tpu.encoder.core import Encoder
from video_steganography_pcamv_tpu.decoder import decode_annexb
from video_steganography_pcamv_tpu import native

W, H = 128, 96


def _busy_frames(n, seed=3):
    """High-detail content with localized motion: forces sub-8x8
    splits at small QP."""
    rng = np.random.RandomState(seed)
    pad = 40
    a = rng.randint(0, 256, (H + 2 * pad, W + 2 * pad)).astype(np.uint8)
    a = ((a.astype(np.int32) + np.roll(a, 1, 0) + np.roll(a, 1, 1)) // 3) \
        .astype(np.uint8)
    out = []
    for i in range(n):
        y = np.ascontiguousarray(a[pad + i:pad + i + H,
                                   pad + 2 * i:pad + 2 * i + W]).copy()
        # a block moving differently than the pan
        y[40:56, 40 + 3 * i:56 + 3 * i] = \
            a[pad:pad + 16, pad:pad + 16]
        out.append(Frame(y, np.full((H // 2, W // 2), 100, np.uint8),
                         np.full((H // 2, W // 2), 140, np.uint8)))
    return out


@pytest.mark.skipif(native.load() is None, reason="no native lib")
@pytest.mark.parametrize("cabac", [False, True])
def test_native_sub_writer_matches_python(cabac):
    frames = _busy_frames(4)
    # deblock off: _native=None would also disable the host deblocker
    # and diverge recon — this test isolates the entropy writers
    p = Params(width=W, height=H, qp=22, me_range=8, p4x4=True,
               cabac=cabac, deblock=False)
    enc_n = Encoder(p)
    bs_native = b"".join(enc_n.encode_frame(f) for f in frames)

    enc_p = Encoder(p)
    enc_p._native = None        # force the Python oracle writers
    bs_python = b"".join(enc_p.encode_frame(f) for f in frames)
    assert bs_native == bs_python

    # sub splits must actually be exercised
    dec = decode_annexb(bs_native)
    kinds = {m.mb_type for d in dec for m in d.mbs}
    assert "P8x8" in kinds, kinds
    enc_chk = Encoder(p)
    enc_chk.keep_recon = True
    for f in frames:
        enc_chk.encode_frame(f)
    for i, d in enumerate(dec):
        ry = enc_chk.recon_by_disp[i][0][:H, :W].astype(np.uint8)
        np.testing.assert_array_equal(d.y, ry, err_msg=f"frame {i}")


@pytest.mark.skipif(native.load() is None, reason="no native lib")
@pytest.mark.parametrize("cabac", [False, True])
def test_mref_p4x4_roundtrip(cabac):
    """Mixed multi-ref + sub-8x8 (--ref 3 --p4x4): per-8x8 refs with
    sub splits inside (the analyse.c:1291 mixed-ref rule generalized),
    ref-aware MVP scan, te(v)/ctx-54 syntax, native == Python."""
    frames = _busy_frames(6, seed=5)
    p = Params(width=W, height=H, qp=24, me_range=8, p4x4=True,
               ref_frames=3, cabac=cabac, deblock=False)
    enc_n = Encoder(p)
    enc_n.keep_recon = True
    bs_n = b"".join(enc_n.encode_frame(f) for f in frames)
    dec = decode_annexb(bs_n)
    assert len(dec) == 6
    for i, d in enumerate(dec):
        ry = enc_n.recon_by_disp[i][0][:H, :W].astype(np.uint8)
        np.testing.assert_array_equal(d.y, ry, err_msg=f"frame {i}")
        ru = enc_n.recon_by_disp[i][1][:H // 2, :W // 2] \
            .astype(np.uint8)
        np.testing.assert_array_equal(d.u, ru, err_msg=f"frame {i} u")
    kinds = {m.mb_type for d in dec for m in d.mbs}
    assert "P8x8" in kinds, kinds

    enc_p = Encoder(p)
    enc_p._native = None
    bs_p = b"".join(enc_p.encode_frame(f) for f in frames)
    assert bs_n == bs_p


def test_mref_p4x4_with_deblock():
    """Same combo with the in-loop deblocker (ref-aware bS)."""
    frames = _busy_frames(5, seed=7)
    p = Params(width=W, height=H, qp=24, me_range=8, p4x4=True,
               ref_frames=2)
    enc = Encoder(p)
    enc.keep_recon = True
    bs = b"".join(enc.encode_frame(f) for f in frames)
    dec = decode_annexb(bs)
    for i, d in enumerate(dec):
        ry = enc.recon_by_disp[i][0][:H, :W].astype(np.uint8)
        np.testing.assert_array_equal(d.y, ry, err_msg=f"frame {i}")
