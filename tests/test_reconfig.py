"""x264_encoder_reconfig analog (reference encoder/encoder.c:837-878):
whitelisted knobs change mid-stream, guarded knobs clamp, illegal ones
raise, and the resulting stream still decodes end to end."""

import numpy as np
import pytest

from video_steganography_pcamv_tpu.params import Params
from video_steganography_pcamv_tpu.utils.yuv import Frame
from video_steganography_pcamv_tpu.utils.log import PcamvError
from video_steganography_pcamv_tpu.encoder.core import Encoder
from video_steganography_pcamv_tpu.decoder import decode_annexb

W, H = 64, 48


def _frames(n, seed=3):
    rng = np.random.RandomState(seed)
    base = rng.randint(30, 220, (H + 8 * n, W + 8 * n)).astype(np.uint8)
    for _ in range(2):
        base = ((base.astype(np.int32) + np.roll(base, 1, 0)
                 + np.roll(base, 1, 1)) // 3).astype(np.uint8)
    out = []
    for i in range(n):
        y = base[4 * i:4 * i + H, 8 * i:8 * i + W]
        u = (y[::2, ::2] // 2 + 60).astype(np.uint8)
        v = (y[1::2, ::2] // 2 + 40).astype(np.uint8)
        out.append(Frame(y.copy(), u, v))
    return out


def test_reconfig_changes_apply_and_stream_decodes():
    frames = _frames(6)
    p = Params(width=W, height=H, qp=28, me_range=8, ref_frames=2,
               partitions=True)
    enc = Encoder(p)
    bs = b"".join(enc.encode_frame(f) for f in frames[:3])
    enc.reconfig(deblock_alpha=2, deblock_beta=-1, me_range=4,
                 ref_frames=1, partitions=False, trellis=0)
    assert enc.p.me_range == 4 and enc.p.ref_frames == 1
    bs += b"".join(enc.encode_frame(f) for f in frames[3:])
    bs += enc.flush()
    dec = decode_annexb(bs)
    assert len(dec) == 6
    # post-reconfig frames must be faithful: decoded recon tracks the
    # source within the usual qp-28 band
    for i in (4, 5):
        mse = float(np.mean((dec[i].y.astype(np.int64)
                             - frames[i].y.astype(np.int64)) ** 2))
        assert mse < 200.0, (i, mse)


def test_reconfig_clamps_and_rejects():
    p = Params(width=W, height=H, qp=28, me_range=8, ref_frames=2)
    enc = Encoder(p)
    enc.encode_frame(_frames(1)[0])
    # me_range can only shrink back up to the open-time value
    enc.reconfig(me_range=64)
    assert enc.p.me_range == 8
    # ref window never exceeds the SPS / open-time count
    enc.reconfig(ref_frames=9)
    assert enc.p.ref_frames <= 2
    with pytest.raises(PcamvError):
        enc.reconfig(width=128)
    with pytest.raises(PcamvError):
        enc.reconfig(cabac=True)
    with pytest.raises(PcamvError):
        enc.reconfig(transform_8x8=True)   # PPS flag not written
    # but toggling 8x8 OFF->ON is fine when the PPS enabled it
    p2 = Params(width=W, height=H, qp=28, me_range=8, cabac=True,
                transform_8x8=True)
    enc2 = Encoder(p2)
    enc2.encode_frame(_frames(1)[0])
    enc2.reconfig(transform_8x8=False)
    enc2.reconfig(transform_8x8=True)
    assert enc2.p.transform_8x8
