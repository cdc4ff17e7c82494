"""Pipelined serving driver + incremental pass-2 re-encode.

Three encoders over the same sequence must produce bit-identical
streams: (a) the legacy synchronous path with the full-frame re-encode,
(b) the incremental re-encode, (c) the pipelined driver (device
deblock twin + one-frame-deferred entropy). The deblock device twin is
bit-exact vs the host C++ (test_deblock_device), so (c) == (a) checks
the whole pipelined flow: deferred lean pack/unpack, AU ordering,
state capture (frame_num/poc/aud), and the drain on flush()."""

import numpy as np
import pytest

from video_steganography_pcamv_tpu.params import Params, StegoParams
from video_steganography_pcamv_tpu.utils.yuv import Frame
from video_steganography_pcamv_tpu.encoder.core import Encoder
from video_steganography_pcamv_tpu.decoder import decode_annexb
from video_steganography_pcamv_tpu.stego.extract import extract_from_stream

W, H = 112, 80


def _seq(n, seed=1):
    rng = np.random.RandomState(seed)
    big = rng.randint(30, 226, ((H + 64) // 4, (W + 64) // 4))
    big = np.repeat(np.repeat(big, 4, 0), 4, 1).astype(np.uint8)
    frames = []
    for i in range(n):
        f = big[16 + i:16 + i + H, 16 + 2 * i:16 + 2 * i + W].copy()
        u = np.full((H // 2, W // 2), 120 + i, np.uint8)
        frames.append(Frame(f, u, u.copy()))
    return frames


def _encode(p, frames):
    enc = Encoder(p)
    bs = b""
    for f in frames:
        bs += enc.encode_frame(f)
    bs += enc.flush()
    return enc, bs


@pytest.mark.parametrize("em_rate", [16.0])
def test_pipeline_and_incremental_bitexact(em_rate):
    frames = _seq(6)
    key = 9
    base = dict(width=W, height=H, qp=26, me_range=8, partitions=True,
                stego=StegoParams(em_rate=em_rate, key=key))
    p_sync = Params(**base, incremental=False, pipeline=False)
    p_incr = Params(**base, incremental=True, pipeline=False)
    p_pipe = Params(**base, incremental=True, pipeline=True,
                    deblock_device=True, psnr=False)

    enc_a, bs_a = _encode(p_sync, frames)
    enc_b, bs_b = _encode(p_incr, frames)
    enc_c, bs_c = _encode(p_pipe, frames)

    assert bs_b == bs_a, "incremental re-encode changed the stream"
    assert bs_c == bs_a, "pipelined driver changed the stream"

    dec = decode_annexb(bs_c)
    assert len(dec) == len(frames)
    got = extract_from_stream(bs_c, em_rate=em_rate, key=key)
    sent = enc_c._stego.sent_messages
    assert len(got) == len(sent)
    for g, s in zip(got, sent):
        np.testing.assert_array_equal(g, s)


def test_pipeline_aus_lag_and_drain():
    """AUs lag one frame in pipelined mode and flush() drains the tail
    in order."""
    frames = _seq(4)
    p = Params(width=W, height=H, qp=26, me_range=8, partitions=True,
               pipeline=True, deblock_device=True, psnr=False,
               stego=StegoParams(em_rate=8.0, key=3))
    enc = Encoder(p)
    per_call = [enc.encode_frame_aus(f) for f in frames]
    tail = enc.flush_aus()
    disp_order = [d for aus in per_call + [tail] for (d, _, _) in aus]
    assert disp_order == sorted(disp_order)
    assert len(disp_order) == len(frames)
    # frame 0 is the IDR (synchronous); P frames defer by one call
    assert per_call[0][0][2] == "I"
    assert tail, "flush() must emit the deferred last P frame"
