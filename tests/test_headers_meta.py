"""Stream-metadata surface: VUI (SAR / timing / signal type), AUD NALs,
level signaling + validation, sps-id.

Reference model: x264_sps_init/x264_sps_write VUI assembly
(encoder/set.c:147-361), x264_validate_levels (set.c:537), the AUD
emission of x264's b_aud, and the CLI VUI flags (x264.c:301-347).
"""

import numpy as np

from video_steganography_pcamv_tpu.params import Params, param_parse
from video_steganography_pcamv_tpu.utils.yuv import synthetic_sequence
from video_steganography_pcamv_tpu.encoder.core import Encoder
from video_steganography_pcamv_tpu.encoder import headers as H
from video_steganography_pcamv_tpu.decoder import decode_annexb
from video_steganography_pcamv_tpu.decoder.decoder import (
    parse_nals, parse_sps)


def _seq(n=3, w=64, h=48):
    return synthetic_sequence(w, h, n, seed=7)


def _encode(p, frames):
    enc = Encoder(p)
    return b"".join(enc.encode_frame(f) for f in frames) + enc.flush()


def test_vui_roundtrip():
    p = Params(width=64, height=48, qp=30, fps_num=30000, fps_den=1001)
    param_parse(p, "sar", "16:11")
    param_parse(p, "fullrange", "on")
    param_parse(p, "colorprim", "bt709")
    param_parse(p, "colormatrix", "bt470bg")
    param_parse(p, "videoformat", "ntsc")
    p.chromaloc = 1
    bs = _encode(p, _seq())
    sps = next(parse_sps(r) for t, _, r in parse_nals(bs) if t == 7)
    assert sps.vui is not None
    assert sps.vui["sar"] == (16, 11)
    assert sps.vui["fps"] == (2 * 30000, 2 * 1001)
    assert sps.vui["fullrange"] == 1
    assert sps.vui["colorprim"] == 1      # bt709
    assert sps.vui["colmatrix"] == 5      # bt470bg
    assert sps.vui["videoformat"] == 2    # ntsc
    assert sps.vui["chromaloc"] == (1, 1)
    # stream still decodes bit-exact
    dec = decode_annexb(bs)
    assert len(dec) == 3


def test_aud_emission_and_decode():
    p = Params(width=64, height=48, qp=30, aud=True)
    frames = _seq()
    enc = Encoder(p)
    bs = b"".join(enc.encode_frame(f) for f in frames)
    ry = np.asarray(enc.recon_prev[0])
    nal_types = [t for t, _, _ in parse_nals(bs)]
    assert nal_types.count(9) == 3, nal_types    # one AUD per AU
    assert nal_types.index(9) == 0               # AUD leads the AU
    dec = decode_annexb(bs)                      # decoder skips AUDs
    assert len(dec) == 3
    np.testing.assert_array_equal(dec[-1].y, ry[:48, :64].astype(np.uint8))


def test_level_auto_and_explicit():
    # QCIF fits level 10; explicit --level overrides
    p = Params(width=176, height=144, qp=30, fps_num=15, fps_den=1,
               me_range=16)
    bs = _encode(p, _seq(1, 176, 144))
    sps = next(parse_sps(r) for t, _, r in parse_nals(bs) if t == 7)
    assert sps.level_idc == 10
    p2 = Params(width=176, height=144, qp=30)
    param_parse(p2, "level", "3.1")
    bs2 = _encode(p2, _seq(1, 176, 144))
    sps2 = next(parse_sps(r) for t, _, r in parse_nals(bs2) if t == 7)
    assert sps2.level_idc == 31


def test_level_validation_warns():
    errs = H.validate_levels(10, 120, 68, 30, 1, 4, 512, 0, 0, False)
    assert any("frame MB size" in e for e in errs)
    assert any("MB rate" in e for e in errs)
    assert H.validate_levels(40, 120, 68, 30, 1, 1, 256, 0, 0,
                             False) == []


def test_sps_id_signaled():
    p = Params(width=64, height=48, qp=30, sps_id=3)
    bs = _encode(p, _seq(1))
    sps = next(parse_sps(r) for t, _, r in parse_nals(bs) if t == 7)
    assert sps.sps_id == 3
    assert decode_annexb(bs)
