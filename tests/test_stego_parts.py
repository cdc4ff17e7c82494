"""Partition-MV steganography end-to-end: embed across 16x16/16x8/
8x16/8x8 unit MVs (the reference's full cover, encoder.c:1566-1647),
then blind-extract and verify payload + conformance."""

import numpy as np
import pytest

from video_steganography_pcamv_tpu.params import Params, StegoParams
from video_steganography_pcamv_tpu.utils.yuv import Frame, synthetic_sequence
from video_steganography_pcamv_tpu.encoder.core import Encoder
from video_steganography_pcamv_tpu.decoder import decode_annexb
from video_steganography_pcamv_tpu.stego.extract import (
    extract_from_stream, cover_bits_of_frame)

W, H = 128, 96


def _make_seq(n, seed=0):
    """Split-motion sequence that forces mixed partitions."""
    rng = np.random.RandomState(seed)
    big = rng.randint(40, 216, ((H + 96) // 4, (W + 96) // 4))
    big = np.repeat(np.repeat(big, 4, 0), 4, 1).astype(np.uint8)
    pad = 40
    frames = []
    half = H // 2 + 8
    for i in range(n):
        f = np.zeros((H, W), np.uint8)
        f[:half] = big[pad - 2 * i:pad - 2 * i + half,
                       pad + i:pad + i + W]
        f[half:] = big[pad + half + i:pad + H + i,
                       pad - 2 * i:pad - 2 * i + W]
        u = np.full((H // 2, W // 2), 128, np.uint8)
        frames.append(Frame(f, u, u.copy()))
    return frames


@pytest.mark.parametrize("em_rate", [24.0, 0.5])
def test_partition_stego_roundtrip(em_rate):
    frames = _make_seq(4, seed=3)
    key = 77
    p = Params(width=W, height=H, qp=26, me_range=8, partitions=True,
               stego=StegoParams(em_rate=em_rate, key=key))
    assert p.partitions, "stego must run on the partition pipeline"
    enc = Encoder(p)
    bs = b""
    recons = []
    for f in frames:
        bs += enc.encode_frame(f)
        recons.append(tuple(np.asarray(x) for x in enc.recon_prev))

    dec = decode_annexb(bs)
    assert len(dec) == len(frames)
    # conformance incl. flipped MVs + forced skips
    for i, d in enumerate(dec):
        np.testing.assert_array_equal(
            d.y, recons[i][0][:H, :W].astype(np.uint8),
            err_msg=f"frame {i}")
    # the cover must include multi-MV macroblocks
    multi = [m for d in dec for m in d.mbs
             if m.mb_type in ("P16x8", "P8x16", "P8x8")]
    assert multi, "content produced no partitioned MBs"

    got = extract_from_stream(bs, em_rate=em_rate, key=key)
    sent = enc._stego.sent_messages
    assert len(got) == len(sent) and len(sent) == len(frames) - 1
    for i, (g, s) in enumerate(zip(got, sent)):
        assert len(s) > 0
        np.testing.assert_array_equal(g, s, err_msg=f"frame {i} payload")


def test_partition_cover_larger_than_16x16():
    """Partitioned cover must carry more bits than 16x16-only (the
    point of embedding in P_8x8: capacity)."""
    frames = _make_seq(3, seed=9)
    sizes = {}
    for flag in (False, True):
        p = Params(width=W, height=H, qp=26, me_range=8,
                   partitions=flag,
                   stego=StegoParams(em_rate=0.9, key=3))
        p.partitions = flag  # validate() must not override
        enc = Encoder(p)
        bs = b"".join(enc.encode_frame(f) for f in frames)
        dec = decode_annexb(bs)
        n_cov = sum(len(cover_bits_of_frame(d)) for d in dec
                    if d.slice_type in (0, 5))
        sizes[flag] = n_cov
    assert sizes[True] > sizes[False], sizes


def test_stego_efficiency_sane():
    """STC with h=10 should embed with efficiency well above 1 bit per
    flip on a partitioned cover."""
    frames = _make_seq(4, seed=5)
    p = Params(width=W, height=H, qp=26, me_range=8,
               stego=StegoParams(em_rate=32.0, key=11))
    enc = Encoder(p)
    for f in frames:
        enc.encode_frame(f)
    s = enc.close()
    assert s["message_bits"] > 0
    eff = s["message_bits"] / max(1, s["mv_flips"])
    assert eff > 1.5, s
