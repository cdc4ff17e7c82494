"""Partition-shape RD re-rank (--rd 1; x264_mb_analyse_p_rd,
reference analyse.c:2117): shapes within 5/4 of the SATD best are
fully encoded and re-ranked by SSD + lambda2 * exact CAVLC bits.
Asserts the re-rank is a genuine RD improvement on a deterministic
clip and that the mixed-shape streams stay decodable + conformant."""

import numpy as np
import pytest

from video_steganography_pcamv_tpu.params import Params
from video_steganography_pcamv_tpu.utils.yuv import Frame
from video_steganography_pcamv_tpu.encoder.core import Encoder
from video_steganography_pcamv_tpu.decoder import decode_annexb

W, H = 96, 64


def _frames(n, seed=123):
    rng = np.random.RandomState(seed)
    pad = 4 * n + 16
    a = rng.randint(16, 240, (H + 2 * pad, W + 2 * pad)).astype(np.uint8)
    for _ in range(2):
        a = ((a.astype(np.int32) + np.roll(a, 1, 0) + np.roll(a, 1, 1)
              + np.roll(np.roll(a, 1, 0), 1, 1)) // 4).astype(np.uint8)
    out = []
    for i in range(n):
        yp = a[pad + i:pad + i + H, pad + 2 * i:pad + 2 * i + W]
        noise = (rng.randn(H, W) * 3).astype(np.int32)
        yp = np.clip(yp.astype(np.int32) + noise, 0, 255).astype(np.uint8)
        u = np.clip(110 + (yp[::2, ::2].astype(np.int32) - 128) // 4,
                    0, 255).astype(np.uint8)
        v = np.clip(140 - (yp[::2, ::2].astype(np.int32) - 128) // 4,
                    0, 255).astype(np.uint8)
        out.append(Frame(yp.copy(), u, v))
    return out


def _encode(rd, qp):
    frames = _frames(8)
    p = Params(width=W, height=H, me_range=8, qp=qp,
               partitions=True, rd=rd)
    enc = Encoder(p)
    bs = b"".join(enc.encode_frame(f) for f in frames) + enc.flush()
    dec = decode_annexb(bs)
    mse = float(np.mean([(d.y.astype(np.int64)
                          - f.y.astype(np.int64)) ** 2
                         for d, f in zip(dec, frames)]))
    return len(bs) * 8, 10 * np.log10(255.0 ** 2 / mse), bs, dec


@pytest.mark.slow
def test_rd1_partition_rerank_improves_rd():
    for qp in (26, 32):
        bits0, psnr0, _, _ = _encode(0, qp)
        bits1, psnr1, bs1, dec1 = _encode(1, qp)
        # genuine RD improvement: never meaningfully worse on either
        # axis, strictly better on at least one (deterministic clip)
        assert bits1 <= bits0 * 1.02, (qp, bits0, bits1)
        assert psnr1 >= psnr0 - 0.01, (qp, psnr0, psnr1)
        assert (bits1 < bits0) or (psnr1 > psnr0 + 0.03), \
            (qp, bits0, bits1, psnr0, psnr1)
        assert len(dec1) == 8


@pytest.mark.slow
def test_rd1_stream_is_ffmpeg_conformant(tmp_path):
    cv2 = pytest.importorskip("cv2")
    _, _, bs, dec = _encode(1, 28)
    path = str(tmp_path / "rd1.264")
    with open(path, "wb") as fh:
        fh.write(bs)
    cap = cv2.VideoCapture(path, cv2.CAP_FFMPEG)
    cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
    i = 0
    while True:
        ret, f = cap.read()
        if not ret:
            break
        np.testing.assert_array_equal(f[:H, :W], dec[i].y)
        i += 1
    cap.release()
    assert i == 8
