"""Implicit weighted bipred (--weightb) end-to-end.

Reference model: x264_macroblock_bipred_init
(common/macroblock.c:1420-1453) derives per-(ref0,ref1) weights from
POC distances; pixel_avg_weight_wxh (common/mc.c:67-100) applies
dst = clip((p0*(64-w1) + p1*w1 + 32) >> 6); the PPS signals
weighted_bipred_idc = 2 (encoder/set.c:384,441). The decoder derives
the identical weights from the slice POCs — nothing extra is coded.
"""

import numpy as np
import pytest

from video_steganography_pcamv_tpu.params import Params
from video_steganography_pcamv_tpu.utils.yuv import Frame
from video_steganography_pcamv_tpu.encoder.core import Encoder
from video_steganography_pcamv_tpu.encoder.bslice import bipred_weight
from video_steganography_pcamv_tpu.decoder import decode_annexb

W, H = 96, 64


def test_bipred_weight_values():
    # anchors at display 0 and 3 (POCs 0/6), Bs at 1 and 2 (POCs 2/4):
    # the L1 weight is ~64*tb/td (x264 derivation, exact integer math)
    assert bipred_weight(2, 0, 6, True) == 21    # 1/3 of the way
    assert bipred_weight(4, 0, 6, True) == 42    # 2/3 of the way
    assert bipred_weight(2, 0, 4, True) == 32    # midpoint = average
    assert bipred_weight(2, 0, 6, False) == 32   # flag off
    assert bipred_weight(2, 0, 0, True) == 32    # td == 0 guard


def _fade_frames(n):
    """Linear fade: bipred between anchors wants POC-distance weights."""
    base = (np.arange(H)[:, None] * 2
            + np.arange(W)[None, :]).astype(np.int32)
    u = np.full((H // 2, W // 2), 120, np.uint8)
    v = np.full((H // 2, W // 2), 130, np.uint8)
    out = []
    for i in range(n):
        y = np.clip(base + 24 * i, 0, 255).astype(np.uint8)
        out.append(Frame(y, u.copy(), v.copy()))
    return out


def _encode(frames, **kw):
    p = Params(width=W, height=H, qp=26, me_range=4, bframes=2,
               b_adapt=0, scenecut_threshold=0, **kw)
    enc = Encoder(p)
    enc.keep_recon = True
    bs = b"".join(enc.encode_frame(f) for f in frames) + enc.flush()
    return enc, bs


@pytest.mark.parametrize("cabac,parts", [(False, False), (True, True)])
def test_weightb_roundtrip_bitexact(cabac, parts):
    frames = _fade_frames(7)
    enc, bs = _encode(frames, weightb=True, cabac=cabac,
                      partitions=parts)
    dec = decode_annexb(bs)
    assert len(dec) == 7
    assert 1 in [d.slice_type for d in dec]
    for i, d in enumerate(dec):
        ry, ru, rv = enc.recon_by_disp[i]
        np.testing.assert_array_equal(
            d.y, ry[:H, :W].astype(np.uint8), err_msg=f"frame {i} Y")
        np.testing.assert_array_equal(
            d.u, ru[:H // 2, :W // 2].astype(np.uint8),
            err_msg=f"frame {i} U")
        np.testing.assert_array_equal(
            d.v, rv[:H // 2, :W // 2].astype(np.uint8),
            err_msg=f"frame {i} V")


def test_weightb_changes_the_stream_and_helps_fades():
    frames = _fade_frames(7)
    enc_off, bs_off = _encode(frames, weightb=False)
    enc_on, bs_on = _encode(frames, weightb=True)
    assert bs_on != bs_off
    # same QP: weighting the fade must not cost quality, and should
    # not inflate the stream (B residuals shrink when the prediction
    # tracks the fade)
    off = enc_off.close()
    on = enc_on.close()
    assert on["psnr_y"] >= off["psnr_y"] - 0.05, (off, on)
    assert len(bs_on) <= int(1.02 * len(bs_off)), \
        (len(bs_on), len(bs_off))
