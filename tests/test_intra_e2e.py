"""End-to-end I-frame conformance: encode -> independent decoder ->
bit-exact reconstruction match (the regression model of
/root/reference/doc/regression_test.txt)."""

import numpy as np
import pytest

from video_steganography_pcamv_tpu.params import Params
from video_steganography_pcamv_tpu.utils.yuv import synthetic_sequence
from video_steganography_pcamv_tpu.encoder.core import Encoder
from video_steganography_pcamv_tpu.decoder import decode_annexb


@pytest.mark.parametrize("qp", [18, 26, 38])
def test_iframe_roundtrip_bitexact(qp):
    w, h = 64, 48
    frames = synthetic_sequence(w, h, 1, seed=3)
    p = Params(width=w, height=h, qp=qp, keyint_max=1)
    enc = Encoder(p)
    bs = enc.encode_frame(frames[0])
    dec = decode_annexb(bs)
    assert len(dec) == 1
    ry, ru, rv = enc.recon_prev
    np.testing.assert_array_equal(dec[0].y, ry[:h, :w].astype(np.uint8))
    np.testing.assert_array_equal(dec[0].u, ru[:h // 2, :w // 2].astype(np.uint8))
    np.testing.assert_array_equal(dec[0].v, rv[:h // 2, :w // 2].astype(np.uint8))


def test_iframe_quality_sane():
    w, h = 96, 80
    frames = synthetic_sequence(w, h, 1, seed=5)
    p = Params(width=w, height=h, qp=20, keyint_max=1)
    enc = Encoder(p)
    enc.encode_frame(frames[0])
    summary = enc.close()
    # deblocking can shave a fraction of a dB of source-PSNR on noisy
    # synthetic textures while improving blockiness
    assert summary["psnr_y"] > 37.5, summary
    assert summary["psnr_u"] > 35.0, summary
