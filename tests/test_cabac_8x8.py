"""CABAC category-5 (High-profile 8x8) end-to-end.

--8x8dct --cabac streams must decode bit-exactly: cat-5 residual
(sig/last ctx maps, no coded_block_flag), transform_size_8x8_flag on
ctx 399-401 for I_NxN / inter MBs, i8x8 CABAC mode coding, and the
effective-trans8 deblock rule (flag inferred 0 when cbp_luma == 0 or
the MB was re-decided intra).

Reference: /root/reference/encoder/cabac.c:540-676 (offsets + 8x8
significance maps), :827 (intra flag), :974 (inter flag).
"""

import numpy as np
import pytest

from video_steganography_pcamv_tpu.params import Params, StegoParams
from video_steganography_pcamv_tpu.utils.yuv import Frame
from video_steganography_pcamv_tpu.encoder.core import Encoder
from video_steganography_pcamv_tpu.decoder import decode_annexb

W, H = 128, 96


def _smooth_frames(n, seed=0):
    """Gradient + sine content: favours i8x8/trans8 over 4x4."""
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


def _assert_recon(enc, dec):
    for i, d in enumerate(dec):
        ry = enc.recon_by_disp[i][0][:H, :W].astype(np.uint8)
        np.testing.assert_array_equal(d.y, ry, err_msg=f"frame {i} y")
        ru = enc.recon_by_disp[i][1][:H // 2, :W // 2].astype(np.uint8)
        np.testing.assert_array_equal(d.u, ru, err_msg=f"frame {i} u")


@pytest.mark.parametrize("deblock", [True, False])
def test_cabac_8x8_ippp_bitexact(deblock):
    frames = _smooth_frames(4, seed=4)
    p = Params(width=W, height=H, qp=26, me_range=8,
               transform_8x8=True, cabac=True, deblock=deblock)
    enc = Encoder(p)
    enc.keep_recon = True
    bs = b"".join(enc.encode_frame(f) for f in frames)
    dec = decode_annexb(bs)
    assert len(dec) == 4
    kinds = {m.mb_type for m in dec[0].mbs}
    assert "I8x8" in kinds, kinds     # content must exercise cat-5
    _assert_recon(enc, dec)


def test_cabac_8x8_stego_roundtrip():
    from video_steganography_pcamv_tpu.stego.extract import (
        extract_from_stream)
    frames = _smooth_frames(5, seed=7)
    p = Params(width=W, height=H, qp=26, me_range=8,
               transform_8x8=True, cabac=True,
               stego=StegoParams(em_rate=16.0, key=3))
    enc = Encoder(p)
    enc.keep_recon = True
    bs = b"".join(enc.encode_frame(f) for f in frames)
    dec = decode_annexb(bs)
    _assert_recon(enc, dec)
    got = extract_from_stream(bs, em_rate=16.0, key=3)
    sent = enc._stego.sent_messages
    assert len(got) == len(sent)
    for g, s in zip(got, sent):
        np.testing.assert_array_equal(g, s)


@pytest.mark.parametrize("cabac", [False, True])
def test_8x8_with_bframes_flag_emitted(cabac):
    """B slices under PPS transform mode must carry the (0) flag for
    every coded MB with luma residual — latent round-1 hole in both
    entropy writers (spec 7.3.5; x264 partition_tab macroblock.h:467)."""
    frames = _smooth_frames(6, seed=9)
    p = Params(width=W, height=H, qp=26, me_range=8,
               transform_8x8=True, cabac=cabac, bframes=1, b_adapt=0)
    enc = Encoder(p)
    enc.keep_recon = True
    bs = b"".join(enc.encode_frame(f) for f in frames) + enc.flush()
    dec = decode_annexb(bs)
    assert len(dec) == 6
    assert any(d.slice_type in (1, 6) for d in dec), \
        "expected at least one B frame"
    _assert_recon(enc, dec)


def test_cabac_8x8_trellis_roundtrip():
    """cat-5 trellis (--8x8dct --cabac --trellis 1): bit-exact round
    trip, and the trellis must actually change the coded levels vs
    plain deadzone quant while not spending more bits."""
    frames = _smooth_frames(4, seed=12)
    p = Params(width=W, height=H, qp=28, me_range=8,
               transform_8x8=True, cabac=True, trellis=1)
    enc = Encoder(p)
    enc.keep_recon = True
    bs = b"".join(enc.encode_frame(f) for f in frames)
    dec = decode_annexb(bs)
    _assert_recon(enc, dec)

    p2 = Params(width=W, height=H, qp=28, me_range=8,
                transform_8x8=True, cabac=True, trellis=0)
    enc2 = Encoder(p2)
    bs2 = b"".join(enc2.encode_frame(f) for f in frames)
    assert bs != bs2, "trellis did not engage"
    assert len(bs) <= len(bs2) + 64, (len(bs), len(bs2))


def test_native_cabac_8x8_matches_python():
    """The native CABAC twin must emit byte-identical streams to the
    Python oracle for --8x8dct --cabac (cat-5 residual, flags, i8
    modes)."""
    from video_steganography_pcamv_tpu import native
    if native.load() is None:
        pytest.skip("no native lib")
    frames = _smooth_frames(4, seed=4)
    # deblock off: _native=None would also disable the host deblocker
    # and diverge recon — this test isolates the entropy writers
    p = Params(width=W, height=H, qp=26, me_range=8,
               transform_8x8=True, cabac=True, deblock=False)
    enc_n = Encoder(p)
    bs_n = b"".join(enc_n.encode_frame(f) for f in frames)
    enc_p = Encoder(p)
    enc_p._native = None
    bs_p = b"".join(enc_p.encode_frame(f) for f in frames)
    assert bs_n == bs_p
