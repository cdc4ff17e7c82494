"""CABAC entropy coding end-to-end (reference: encoder/cabac.c:781,
common/cabac.c engine). Encode with cabac=1 -> decode -> bit-exact
recon; CABAC must also beat CAVLC on bits for the same decisions."""

import numpy as np
import pytest

from video_steganography_pcamv_tpu.params import Params, StegoParams
from video_steganography_pcamv_tpu.utils.yuv import synthetic_sequence, Frame
from video_steganography_pcamv_tpu.encoder.core import Encoder
from video_steganography_pcamv_tpu.decoder import decode_annexb

W, H = 128, 96


def _mixed_seq(n, seed):
    rng = np.random.RandomState(seed)
    big = rng.randint(30, 226, ((H + 96) // 4, (W + 96) // 4))
    big = np.repeat(np.repeat(big, 4, 0), 4, 1).astype(np.uint8)
    pad = 40
    half = H // 2 + 8
    out = []
    for i in range(n):
        f = np.zeros((H, W), np.uint8)
        f[:half] = big[pad - i:pad - i + half, pad + 2 * i:pad + 2 * i + W]
        f[half:] = big[pad + half + 2 * i:pad + H + 2 * i,
                       pad - i:pad - i + W]
        u = np.full((H // 2, W // 2), 120, np.uint8)
        out.append(Frame(f, u, u.copy()))
    return out


@pytest.mark.parametrize("qp", [23, 31])
def test_cabac_roundtrip_bitexact(qp):
    frames = _mixed_seq(3, seed=4)
    p = Params(width=W, height=H, qp=qp, me_range=8, cabac=True,
               partitions=True, i4x4=True)
    enc = Encoder(p)
    bs = b""
    recons = []
    for f in frames:
        bs += enc.encode_frame(f)
        recons.append(tuple(np.asarray(x) for x in enc.recon_prev))
    dec = decode_annexb(bs)
    assert len(dec) == 3
    for i, d in enumerate(dec):
        np.testing.assert_array_equal(
            d.y, recons[i][0][:H, :W].astype(np.uint8),
            err_msg=f"frame {i} luma")
        np.testing.assert_array_equal(
            d.u, recons[i][1][:H // 2, :W // 2].astype(np.uint8),
            err_msg=f"frame {i} U")
        np.testing.assert_array_equal(
            d.v, recons[i][2][:H // 2, :W // 2].astype(np.uint8),
            err_msg=f"frame {i} V")
    kinds = {m.mb_type for d in dec for m in d.mbs}
    assert "I4x4" in kinds or "I16x16" in kinds


def test_cabac_beats_cavlc():
    frames = _mixed_seq(4, seed=9)
    sizes = {}
    for cab in (False, True):
        p = Params(width=W, height=H, qp=26, me_range=8, cabac=cab)
        enc = Encoder(p)
        sizes[cab] = sum(len(enc.encode_frame(f)) for f in frames)
    # identical decisions, better entropy coder: expect a real saving
    assert sizes[True] < sizes[False] * 0.99, sizes


def test_cabac_with_stego_payload():
    """CABAC entropy + partition stego: payload survives (the cover is
    in the MVs, independent of the entropy coder)."""
    from video_steganography_pcamv_tpu.stego.extract import (
        extract_from_stream)
    frames = _mixed_seq(4, seed=6)
    p = Params(width=W, height=H, qp=26, me_range=8, cabac=True,
               stego=StegoParams(em_rate=16.0, key=9))
    enc = Encoder(p)
    bs = b"".join(enc.encode_frame(f) for f in frames)
    got = extract_from_stream(bs, em_rate=16.0, key=9)
    for g, s in zip(got, enc._stego.sent_messages):
        np.testing.assert_array_equal(g, s)


def test_native_cabac_matches_python_oracle():
    """The C++ CABAC twin must produce bit-identical slices to the
    Python oracle (checkasm model)."""
    from video_steganography_pcamv_tpu import native
    if native.load() is None:
        pytest.skip("native lib missing")
    frames = _mixed_seq(3, seed=11)
    # deblock off so both encoders make identical decisions (the
    # Python-writer encoder has no native deblock to apply)
    p = Params(width=W, height=H, qp=27, me_range=8, cabac=True,
               deblock=False)
    enc_n = Encoder(p)
    bs_native = b"".join(enc_n.encode_frame(f) for f in frames)
    p2 = Params(width=W, height=H, qp=27, me_range=8, cabac=True,
                deblock=False)
    enc_p = Encoder(p2)
    enc_p._native = None  # force the Python writer path
    bs_python = b"".join(enc_p.encode_frame(f) for f in frames)
    assert bs_native == bs_python
