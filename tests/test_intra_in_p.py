"""Intra-in-P end-to-end (reference: the final intra compare of
x264_macroblock_analyse's P path, analyse.c:2812-2825). A P frame with
brand-new content (occlusion reveal) must switch those MBs to intra,
and the stream must stay bit-exact through the verification decoder."""

import numpy as np
import pytest

from video_steganography_pcamv_tpu.params import Params, StegoParams
from video_steganography_pcamv_tpu.utils.yuv import Frame
from video_steganography_pcamv_tpu.encoder.core import Encoder
from video_steganography_pcamv_tpu.decoder import decode_annexb

W, H = 128, 96


def _frames(seed=0):
    rng = np.random.RandomState(seed)
    base = np.repeat(np.repeat(
        rng.randint(40, 216, (H // 4 + 16, W // 4 + 16)), 4, 0), 4, 1) \
        .astype(np.uint8)
    f0 = base[:H, :W].copy()
    f1 = base[2:H + 2, 3:W + 3].copy()          # global motion
    # occlusion reveal: a block of content absent from frame 0
    new = np.repeat(np.repeat(
        rng.randint(0, 256, (12, 16)), 4, 0), 4, 1).astype(np.uint8)
    f1[24:72, 32:96] = new[:48, :64]
    u = np.full((H // 2, W // 2), 128, np.uint8)
    return [Frame(f0, u, u.copy()), Frame(f1, u.copy(), u.copy())]


@pytest.mark.parametrize("cabac", [False, True])
def test_intra_in_p_roundtrip(cabac):
    frames = _frames(3)
    p = Params(width=W, height=H, qp=26, me_range=8, cabac=cabac,
               intra_in_p=True)
    enc = Encoder(p)
    bs = b""
    recons = []
    for f in frames:
        bs += enc.encode_frame(f)
        recons.append(tuple(np.asarray(x) for x in enc.recon_prev))
    dec = decode_annexb(bs)
    assert len(dec) == 2
    kinds = [m.mb_type for m in dec[1].mbs]
    assert any(k in ("I16x16", "I4x4") for k in kinds), set(kinds)
    assert any(k.startswith("P") or k == "SKIP" for k in kinds)
    for i, d in enumerate(dec):
        np.testing.assert_array_equal(
            d.y, recons[i][0][:H, :W].astype(np.uint8),
            err_msg=f"frame {i} (cabac={cabac})")
        np.testing.assert_array_equal(
            d.u, recons[i][1][:H // 2, :W // 2].astype(np.uint8))


def test_intra_in_p_disabled_when_embedding():
    """Reference parity: embedding forces intra-in-P off
    (analyse.c:2862-2863) so pass decisions stay MV-only."""
    frames = _frames(5)
    p = Params(width=W, height=H, qp=26, me_range=8,
               stego=StegoParams(em_rate=8.0, key=2))
    enc = Encoder(p)
    bs = b"".join(enc.encode_frame(f) for f in frames)
    dec = decode_annexb(bs)
    kinds = {m.mb_type for m in dec[1].mbs}
    assert not any(k.startswith("I") for k in kinds), kinds


def test_intra_in_p_improves_quality_on_reveal():
    frames = _frames(7)
    out = {}
    for flag in (False, True):
        p = Params(width=W, height=H, qp=30, me_range=8,
                   intra_in_p=flag)
        enc = Encoder(p)
        for f in frames:
            enc.encode_frame(f)
        ry = np.asarray(enc.recon_prev[0])[:H, :W]
        mse = float(np.mean((ry.astype(np.int64)
                             - frames[1].y.astype(np.int64)) ** 2))
        out[flag] = mse
    # soft heuristic, not a conformance bound: intra-in-P should not
    # hurt a reveal clip. The CQP frame-type offsets (ratecontrol.c:
    # 369-373 parity) shifted the I/P QP split and with it this
    # margin; sub-percent MSE wiggle is noise at qp 30.
    assert out[True] <= out[False] * 1.01, out
