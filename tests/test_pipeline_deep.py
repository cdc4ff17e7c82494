"""Deep-pipelined serving mode (Params.pipeline_deep): conformance +
blind-extraction round trip + bounded quality divergence vs the
canonical pipelined path (the analysis may differ near flipped MBs —
the bitstream must stay decodable and the payload exact)."""

import numpy as np
import pytest

from video_steganography_pcamv_tpu.params import Params, StegoParams
from video_steganography_pcamv_tpu.utils.yuv import synthetic_sequence
from video_steganography_pcamv_tpu.encoder.core import Encoder
from video_steganography_pcamv_tpu.stego.extract import (
    extract_from_stream)
from video_steganography_pcamv_tpu.decoder.decoder import decode_annexb


def _psnr(dec, frames):
    se = px = 0
    for rec, f in zip(dec, frames):
        d = rec.y[:f.y.shape[0], :f.y.shape[1]].astype(np.int64) \
            - f.y.astype(np.int64)
        se += int(np.sum(d * d))
        px += f.y.size
    return 10 * np.log10(255.0 * 255.0 * px / max(se, 1))


def _run(deep: bool, frames, w, h, em=24.0):
    p = Params(width=w, height=h, qp=28, me_range=8,
               deblock_device=True, psnr=False,
               stego=StegoParams(em_rate=em, key=11))
    p.pipeline_deep = deep
    enc = Encoder(p)
    bs = b"".join(enc.encode_frame(f) for f in frames) + enc.flush()
    return bs, enc


@pytest.mark.parametrize("n_frames", [6])
def test_deep_roundtrip_and_quality(n_frames):
    w, h = 128, 96
    frames = synthetic_sequence(w, h, n_frames, seed=5)

    bs_d, enc_d = _run(True, frames, w, h)
    dec_d = decode_annexb(bs_d)
    assert len(dec_d) == n_frames
    got = extract_from_stream(bs_d, em_rate=24.0, key=11)
    sent = enc_d._stego.sent_messages
    assert len(got) == len(sent)
    assert all(np.array_equal(g, s) for g, s in zip(got, sent))

    bs_c, _ = _run(False, frames, w, h)
    dec_c = decode_annexb(bs_c)
    pd, pc = _psnr(dec_d, frames), _psnr(dec_c, frames)
    # the deep mode's analysis divergence is bounded: same-ballpark RD
    assert abs(pd - pc) < 0.5, (pd, pc)
    assert len(bs_d) < 1.2 * len(bs_c), (len(bs_d), len(bs_c))


def test_deep_idr_fallback():
    """keyint expiry inside the speculated window: the fallback must
    discard the speculation, emit a conformant IDR, and keep both the
    stream and the payload intact."""
    w, h = 112, 80
    n = 9
    frames = synthetic_sequence(w, h, n, seed=8)
    p = Params(width=w, height=h, qp=30, me_range=8,
               deblock_device=True, psnr=False, keyint_max=4,
               stego=StegoParams(em_rate=16.0, key=2))
    p.pipeline_deep = True
    enc = Encoder(p)
    bs = b"".join(enc.encode_frame(f) for f in frames) + enc.flush()
    dec = decode_annexb(bs)
    assert len(dec) == n
    assert enc.stats.i_frames >= 2          # keyint 4 forced IDRs
    got = extract_from_stream(bs, em_rate=16.0, key=2)
    sent = enc._stego.sent_messages
    assert len(got) == len(sent)
    assert all(np.array_equal(g, s) for g, s in zip(got, sent))
