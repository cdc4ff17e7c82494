"""B-pyramid (--b-pyramid): the middle B of each GOP becomes a
reference; outer Bs reference it through the default POC-ordered
lists, and the next anchor carries one L0 reordering op so it stays
on the previous anchor (the default PicNum order would lead with the
BREF). Reference: encoder/encoder.c:2207 (BREF reorder), :138-150
(reordering ops), x264.h:197.
"""

import numpy as np
import pytest

from video_steganography_pcamv_tpu.params import Params
from video_steganography_pcamv_tpu.utils.yuv import Frame
from video_steganography_pcamv_tpu.encoder.core import Encoder
from video_steganography_pcamv_tpu.decoder import decode_annexb

W, H = 128, 96


def _pan_frames(n, seed=5, step=2):
    rng = np.random.RandomState(seed)
    pad = 48
    a = rng.randint(20, 236, (H + 2 * pad, W + 2 * pad)).astype(np.uint8)
    for _ in range(3):
        a = ((a.astype(np.int32) + np.roll(a, 1, 0) + np.roll(a, 1, 1)
              + np.roll(np.roll(a, 1, 0), 1, 1)) // 4).astype(np.uint8)
    out = []
    for i in range(n):
        s = step * i
        y = np.ascontiguousarray(a[pad + s:pad + s + H,
                                   pad + 2 * s:pad + 2 * s + W])
        out.append(Frame(y, np.full((H // 2, W // 2), 100, np.uint8),
                         np.full((H // 2, W // 2), 140, np.uint8)))
    return out


def _bref_count(bs: bytes) -> int:
    """Count B slices with nal_ref_idc != 0 (type-1 non-IDR slices that
    are kept as references and are B by POC ordering can only be our
    BREFs: P anchors are also type 1, so parse the slice_type)."""
    from video_steganography_pcamv_tpu.utils.bitstream import (
        BitReader, nal_unescape)
    n_bref = 0
    i = 0
    while True:
        j = bs.find(b"\x00\x00\x01", i)
        if j < 0:
            break
        k = bs.find(b"\x00\x00\x01", j + 3)
        payload = bs[j + 3:k if k > 0 else len(bs)]
        if payload and (payload[0] & 0x1F) == 1 \
                and (payload[0] >> 5) != 0:
            br = BitReader(nal_unescape(payload[1:]))
            br.read_ue()                      # first_mb
            st = br.read_ue()                 # slice_type
            if st in (1, 6):
                n_bref += 1
        i = j + 3
    return n_bref


@pytest.mark.parametrize("cabac", [False, True])
def test_bpyramid_roundtrip(cabac):
    frames = _pan_frames(9)
    p = Params(width=W, height=H, qp=26, me_range=8, bframes=2,
               b_adapt=0, b_pyramid=True, cabac=cabac)
    enc = Encoder(p)
    enc.keep_recon = True
    bs = b"".join(enc.encode_frame(f) for f in frames) + enc.flush()
    assert _bref_count(bs) >= 2, "expected reference B slices"
    dec = decode_annexb(bs)
    assert len(dec) == 9
    for i, d in enumerate(dec):
        ry = enc.recon_by_disp[i][0][:H, :W].astype(np.uint8)
        np.testing.assert_array_equal(d.y, ry, err_msg=f"frame {i}")
        ru = enc.recon_by_disp[i][1][:H // 2, :W // 2].astype(np.uint8)
        np.testing.assert_array_equal(d.u, ru, err_msg=f"frame {i} u")


def test_bpyramid_with_weightb_and_intra():
    frames = _pan_frames(9, seed=8, step=3)
    p = Params(width=W, height=H, qp=28, me_range=8, bframes=2,
               b_adapt=0, b_pyramid=True, weightb=True)
    enc = Encoder(p)
    enc.keep_recon = True
    bs = b"".join(enc.encode_frame(f) for f in frames) + enc.flush()
    dec = decode_annexb(bs)
    assert len(dec) == 9
    for i, d in enumerate(dec):
        ry = enc.recon_by_disp[i][0][:H, :W].astype(np.uint8)
        np.testing.assert_array_equal(d.y, ry, err_msg=f"frame {i}")


def test_bpyramid_clamped_without_enough_bframes():
    p = Params(width=W, height=H, bframes=1, b_pyramid=True)
    p.validate()
    assert not p.b_pyramid   # x264 encoder.c:463 clamp
