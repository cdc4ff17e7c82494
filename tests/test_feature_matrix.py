"""Cross-feature interaction sweep: combinations that no single-
feature test exercises together. Every stream must decode bit-exact
against the encoder reconstruction and recover its payload."""

import numpy as np
import pytest

from video_steganography_pcamv_tpu.params import Params, StegoParams
from video_steganography_pcamv_tpu.utils.yuv import Frame
from video_steganography_pcamv_tpu.encoder.core import Encoder
from video_steganography_pcamv_tpu.decoder import decode_annexb
from video_steganography_pcamv_tpu.stego.extract import extract_from_stream

W, H = 96, 64


def _frames(n, seed=0):
    rng = np.random.RandomState(seed)
    pad = 4 * n + 16
    a = rng.randint(16, 240, (H + 2 * pad, W + 2 * pad)).astype(np.uint8)
    for _ in range(2):
        a = ((a.astype(np.int32) + np.roll(a, 1, 0) + np.roll(a, 1, 1)
              + np.roll(np.roll(a, 1, 0), 1, 1)) // 4).astype(np.uint8)
    u = np.full((H // 2, W // 2), 116, np.uint8)
    out = []
    for i in range(n):
        yp = a[pad + i:pad + i + H, pad + 2 * i:pad + 2 * i + W]
        noise = (rng.randn(H, W) * 3).astype(np.int32)
        yp = np.clip(yp.astype(np.int32) + noise, 0, 255).astype(np.uint8)
        out.append(Frame(yp, u.copy(), u.copy()))
    return out


CONFIGS = [
    # B + trellis + CABAC + noise reduction, all at once
    dict(bframes=2, trellis=1, cabac=True, noise_reduction=400,
         ssim=True),
    # multi-ref + trellis + short keyint (IDR resets the DPB mid-run)
    dict(ref_frames=2, trellis=1, keyint_max=4, keyint_min=1,
         scenecut_threshold=0),
    # CRF rate control + B frames + CABAC
    dict(bframes=1, crf=30.0, cabac=True),
    # multi-ref B lists + weightb + trellis + CABAC + short keyint
    # (IDR resets the DPB mid-run with B frames in flight)
    dict(ref_frames=3, bframes=2, b_adapt=0, weightb=True, trellis=1,
         cabac=True, keyint_max=6, keyint_min=1, scenecut_threshold=0),
    # multi-ref B + AQ + CQM
    dict(ref_frames=2, bframes=1, b_adapt=0, aq_mode=1,
         aq_strength=1.2, cqm="jvt", cabac=True),
    # b-pyramid + multi-ref + weightb (round-4: the BREF enters the
    # sliding window; B L0 lists hold reference Bs)
    dict(ref_frames=2, bframes=3, b_adapt=0, b_pyramid=True,
         weightb=True, cabac=True),
    # b-pyramid + temporal direct (round-4: POC-matched
    # map_col_to_list0 across the pyramid)
    dict(ref_frames=2, bframes=3, b_adapt=0, b_pyramid=True,
         direct=2),
    # multi-ref + sub-8x8 + embedding (round-4: per-block-ref RCA
    # probe tables)
    dict(ref_frames=2, p4x4=True),
    # multi-ref WITHOUT partitions (round-5 gate deletion: b66 allows
    # --ref N --partitions none — 16x16-only per-ref ME + ref_idx)
    dict(ref_frames=3, partitions=False),
    dict(ref_frames=2, partitions=False, bframes=2, b_adapt=0,
         cabac=True),
]


@pytest.mark.parametrize("cfg", CONFIGS,
                         ids=["b+trellis+cabac+nr", "mref+trellis+idr",
                              "crf+b+cabac", "bmref+weightb+trellis",
                              "bmref+aq+cqm",
                              "pyramid+mref+weightb",
                              "pyramid+temporal",
                              "mref+p4x4+stego",
                              "mref+noparts+stego",
                              "mref+noparts+b+cabac"])
def test_feature_combo_roundtrip(cfg):
    n = 8
    frames = _frames(n, seed=sum(map(ord, str(sorted(cfg.items())))))
    stego = StegoParams(em_rate=12.0, key=21)
    p = Params(width=W, height=H, qp=27, me_range=4, stego=stego, **cfg)
    enc = Encoder(p)
    enc.keep_recon = True
    bs = b""
    for f in frames:
        bs += enc.encode_frame(f)
    bs += enc.flush()
    dec = decode_annexb(bs)
    assert len(dec) == n
    for i, d in enumerate(dec):
        ry, ru, rv = enc.recon_by_disp[i]
        np.testing.assert_array_equal(
            d.y, ry[:H, :W].astype(np.uint8), err_msg=f"frame {i} Y")
        np.testing.assert_array_equal(
            d.u, ru[:H // 2, :W // 2].astype(np.uint8),
            err_msg=f"frame {i} U")
    got = extract_from_stream(bs, em_rate=12.0, key=21)
    sent = enc._stego.sent_messages
    assert len(got) == len(sent) > 0
    for g, s in zip(got, sent):
        np.testing.assert_array_equal(g, s)


T8_P4_CONFIGS = [
    dict(p4x4=True, transform_8x8=True),
    dict(p4x4=True, transform_8x8=True, rd=1),
    dict(p4x4=True, transform_8x8=True, cabac=True, trellis=1),
]


@pytest.mark.parametrize("cfg", T8_P4_CONFIGS,
                         ids=["p4x4+8x8dct", "p4x4+8x8dct+rd",
                              "p4x4+8x8dct+cabac+trellis"])
def test_p4x4_with_8x8dct(cfg):
    """Round-5 gate deletion: b66 allows --8x8dct with sub-8x8
    partitions (x264_mb_transform_8x8_allowed, macroblock.h:462 —
    the flag is simply absent on MBs carrying sub-8x8 partitions,
    spec 7.3.5). Streams must decode bit-exact against the encoder
    recon and recover the payload."""
    n = 8
    frames = _frames(n, seed=len(cfg))
    stego = StegoParams(em_rate=12.0, key=33)
    p = Params(width=W, height=H, qp=26, me_range=4, stego=stego, **cfg)
    p.validate()
    enc = Encoder(p)
    enc.keep_recon = True
    bs = b""
    for f in frames:
        bs += enc.encode_frame(f)
    bs += enc.flush()
    dec = decode_annexb(bs)
    assert len(dec) == n
    t8_seen = 0
    for i, d in enumerate(dec):
        ry, ru, rv = enc.recon_by_disp[i]
        np.testing.assert_array_equal(
            d.y, ry[:H, :W].astype(np.uint8), err_msg=f"frame {i} Y")
        np.testing.assert_array_equal(
            d.u, ru[:H // 2, :W // 2].astype(np.uint8),
            err_msg=f"frame {i} U")
    got = extract_from_stream(bs, em_rate=12.0, key=33)
    sent = enc._stego.sent_messages
    assert len(got) == len(sent) > 0
    for g, s in zip(got, sent):
        np.testing.assert_array_equal(g, s)
