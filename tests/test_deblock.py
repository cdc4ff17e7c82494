"""In-loop deblocking: conformance + quality."""

import numpy as np
import pytest

from video_steganography_pcamv_tpu import native
from video_steganography_pcamv_tpu.params import Params, StegoParams
from video_steganography_pcamv_tpu.utils.yuv import synthetic_sequence
from video_steganography_pcamv_tpu.encoder.core import Encoder
from video_steganography_pcamv_tpu.decoder import decode_annexb

pytestmark = pytest.mark.skipif(native.load() is None,
                                reason="native lib unavailable")


def _roundtrip(deblock, n=4, qp=30, w=64, h=48, stego=0.0):
    frames = synthetic_sequence(w, h, n, seed=11)
    p = Params(width=w, height=h, qp=qp, me_range=8, deblock=deblock,
               stego=StegoParams(em_rate=stego, key=3))
    enc = Encoder(p)
    chunks, recons = [], []
    for f in frames:
        chunks.append(enc.encode_frame(f))
        recons.append(tuple(np.array(x) for x in enc.recon_prev))
    dec = decode_annexb(b"".join(chunks))
    for i, d in enumerate(dec):
        ry, ru, rv = recons[i]
        np.testing.assert_array_equal(
            d.y, ry[:h, :w].astype(np.uint8),
            err_msg=f"frame {i} luma mismatch (deblock={deblock})")
        np.testing.assert_array_equal(
            d.u, ru[:h // 2, :w // 2].astype(np.uint8),
            err_msg=f"frame {i} chroma mismatch (deblock={deblock})")
    return enc


def test_deblock_roundtrip_bitexact():
    _roundtrip(True)


def test_deblock_with_stego_roundtrip():
    enc = _roundtrip(True, stego=16.0)
    assert enc.stats.mv_flips > 0


def test_deblock_improves_low_bitrate_quality():
    frames = synthetic_sequence(96, 80, 5, seed=2)

    def run(deblock):
        p = Params(width=96, height=80, qp=38, me_range=8,
                   deblock=deblock)
        e = Encoder(p)
        for f in frames:
            e.encode_frame(f)
        return e.close()["psnr_y"]

    # deblocking must change recon and not collapse quality; at high QP
    # it typically helps slightly on blocky content
    p_on, p_off = run(True), run(False)
    assert abs(p_on - p_off) < 2.0
    assert p_on > 25


def test_deblock_actually_filters():
    """The filtered recon must differ from the unfiltered one."""
    frames = synthetic_sequence(64, 48, 2, seed=5)

    def recon(deblock):
        p = Params(width=64, height=48, qp=35, me_range=8,
                   deblock=deblock)
        e = Encoder(p)
        for f in frames:
            e.encode_frame(f)
        return np.array(e.recon_prev[0])

    assert not np.array_equal(recon(True), recon(False))


def test_deblock_alpha_beta_offsets():
    """--deblock A:B offsets (spec slice_alpha_c0/beta_offset_div2):
    bitstream signals them, decoder applies them, recon stays
    bit-exact, and nonzero offsets actually change the filtering."""
    from tests.test_bframes import _pan_frames
    from video_steganography_pcamv_tpu.decoder import decode_annexb
    W2, H2 = 96, 64
    frames = _pan_frames(W2, H2, 4, seed=1)
    outs = {}
    for ab in ((0, 0), (3, 3), (-6, -6)):
        p = Params(width=W2, height=H2, qp=30, me_range=4,
                   deblock_alpha=ab[0], deblock_beta=ab[1])
        enc = Encoder(p)
        bs = b"".join(enc.encode_frame(f) for f in frames)
        dec = decode_annexb(bs)
        ry = np.asarray(enc.recon_prev[0])[:H2, :W2].astype(np.uint8)
        np.testing.assert_array_equal(dec[-1].y, ry, err_msg=f"{ab}")
        outs[ab] = dec[-1].y.copy()
    assert not np.array_equal(outs[(0, 0)], outs[(3, 3)])
    assert not np.array_equal(outs[(0, 0)], outs[(-6, -6)])
