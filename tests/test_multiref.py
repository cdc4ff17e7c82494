"""Multi-reference ME (x264 --ref > 1) end-to-end.

Reference model: the per-ref search loop of
x264_mb_analyse_inter_p16x16 (analyse.c:1122-1200), ref_idx_l0 te(v)
syntax (spec 7.3.5.2), ref-aware MVP same-ref rules (spec 8.4.1.3) and
the different-ref bS deblock rule (spec 8.7.2.1). Content flickers so
that frame t matches t-2 far better than t-1 — ref 1 must win.
"""

import numpy as np
import pytest

from video_steganography_pcamv_tpu.params import Params, StegoParams
from video_steganography_pcamv_tpu.utils.yuv import Frame
from video_steganography_pcamv_tpu.encoder.core import Encoder
from video_steganography_pcamv_tpu.decoder import decode_annexb

W, H = 96, 64


def _flicker_frames(w, h, n, seed=0):
    """f0 = texture A; odd frames = unrelated texture B (noise burst);
    even frames = A shifted a little. Even frames match the frame two
    back, not the previous one."""
    rng = np.random.RandomState(seed)
    pad = 16
    a = rng.randint(30, 226, (h + 2 * pad, w + 2 * pad)).astype(np.uint8)
    a = ((a.astype(np.int32) + np.roll(a, 1, 0) + np.roll(a, 1, 1)
          + np.roll(np.roll(a, 1, 0), 1, 1)) // 4).astype(np.uint8)
    b = rng.randint(0, 256, (h, w)).astype(np.uint8)
    u = np.full((h // 2, w // 2), 128, np.uint8)
    frames = []
    for i in range(n):
        if i % 2 == 1:
            yp = b
        else:
            sh = i // 2
            yp = a[pad + sh:pad + sh + h, pad + 2 * sh:pad + 2 * sh + w]
        frames.append(Frame(np.ascontiguousarray(yp), u.copy(), u.copy()))
    return frames


@pytest.mark.parametrize("cabac", [False, True])
def test_multiref_roundtrip_bitexact(cabac):
    frames = _flicker_frames(W, H, 4, seed=3)
    p = Params(width=W, height=H, qp=26, me_range=4, ref_frames=2,
               cabac=cabac)
    enc = Encoder(p)
    bs = b""
    recons = []
    for f in frames:
        bs += enc.encode_frame(f)
        recons.append(tuple(np.asarray(x) for x in enc.recon_prev))
    # frame 2 (even) must use ref 1 somewhere
    dec = decode_annexb(bs)
    assert len(dec) == 4
    for i, d in enumerate(dec):
        np.testing.assert_array_equal(
            d.y, recons[i][0][:H, :W].astype(np.uint8),
            err_msg=f"frame {i} luma")
        np.testing.assert_array_equal(
            d.u, recons[i][1][:H // 2, :W // 2].astype(np.uint8),
            err_msg=f"frame {i} U")
    ref8 = enc.last_frame_info["ref8"]
    assert ref8 is not None


def test_multiref_picks_older_ref():
    """On flicker content the even frames must reference idx 1."""
    frames = _flicker_frames(W, H, 3, seed=5)
    p = Params(width=W, height=H, qp=26, me_range=4, ref_frames=2)
    enc = Encoder(p)
    for f in frames:
        enc.encode_frame(f)
    ref8 = enc.last_frame_info["ref8"]
    frac_ref1 = float((ref8 == 1).mean())
    assert frac_ref1 > 0.5, f"only {frac_ref1:.2f} of blocks chose ref 1"


def test_multiref_beats_singleref():
    """2 refs must beat 1 ref on flicker content (PSNR at ~same size or
    smaller at same quality)."""
    frames = _flicker_frames(W, H, 4, seed=7)
    outs = {}
    for r in (1, 2):
        p = Params(width=W, height=H, qp=28, me_range=4, ref_frames=r)
        enc = Encoder(p)
        nbits = 0
        for f in frames:
            nbits += len(enc.encode_frame(f))
        ry = np.asarray(enc.recon_prev[0])[:H, :W]
        mse = np.mean((ry.astype(np.int64)
                       - frames[-1].y.astype(np.int64)) ** 2)
        outs[r] = (nbits, float(mse))
    bits1, mse1 = outs[1]
    bits2, mse2 = outs[2]
    assert bits2 < bits1 * 0.9 or mse2 < mse1 * 0.9, outs


@pytest.mark.parametrize("cabac", [False, True])
def test_multiref_stego_roundtrip(cabac):
    from video_steganography_pcamv_tpu.stego.extract import (
        extract_from_stream)
    frames = _flicker_frames(W, H, 4, seed=11)
    p = Params(width=W, height=H, qp=26, me_range=4, ref_frames=2,
               cabac=cabac, stego=StegoParams(em_rate=16.0, key=5))
    enc = Encoder(p)
    bs = b""
    for f in frames:
        bs += enc.encode_frame(f)
    ry = np.asarray(enc.recon_prev[0])
    dec = decode_annexb(bs)
    np.testing.assert_array_equal(dec[-1].y, ry[:H, :W].astype(np.uint8))
    got = extract_from_stream(bs, em_rate=16.0, key=5)
    sent = enc._stego.sent_messages
    assert len(got) == len(sent)
    for g, s in zip(got, sent):
        np.testing.assert_array_equal(g, s)
