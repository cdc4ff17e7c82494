"""P-partition (16x8/8x16/8x8) end-to-end conformance.

Reference model: the P cascade of x264_macroblock_analyse
(analyse.c:2613-2810) + partition MVP rules (spec 8.4.1.3,
common/macroblock.c:28-145). Content is built so different halves of
many MBs move differently — 16x16-only ME must lose, partitions win."""

import numpy as np
import pytest

from video_steganography_pcamv_tpu.params import Params
from video_steganography_pcamv_tpu.utils.yuv import Frame
from video_steganography_pcamv_tpu.encoder.core import Encoder
from video_steganography_pcamv_tpu.decoder import decode_annexb

W, H = 128, 96


def _make_pair(w, h, seed=0):
    """Frame pair where the top half shifts (+3,0) and the bottom half
    shifts (-3,+2) full-pel, plus an 8x8-checker region with per-block
    motion — forces 16x8 and 8x8 partitions."""
    rng = np.random.RandomState(seed)
    big = rng.randint(40, 216, ((h + 64) // 4, (w + 64) // 4))
    big = np.repeat(np.repeat(big, 4, 0), 4, 1).astype(np.uint8)  # textured
    pad = 32

    def crop(dy, dx, ys, ye):
        return big[pad + dy + ys:pad + dy + ye, pad + dx:pad + dx + w]

    f0 = big[pad:pad + h, pad:pad + w].copy()
    f1 = np.zeros((h, w), np.uint8)
    half = h // 2 + 8   # mid-MB boundary: forces 16x8 splits
    f1[:half] = crop(-3, 0, 0, half)          # top moves down by 3
    f1[half:] = crop(2, 3, half, h)           # bottom moves differently
    u = np.full((h // 2, w // 2), 128, np.uint8)
    v = np.full((h // 2, w // 2), 128, np.uint8)
    return Frame(f0, u, v), Frame(f1, u.copy(), v.copy())


@pytest.mark.parametrize("qp", [24, 32])
def test_partition_roundtrip_bitexact(qp):
    f0, f1 = _make_pair(W, H, seed=2)
    p = Params(width=W, height=H, qp=qp, me_range=8, partitions=True)
    enc = Encoder(p)
    bs = enc.encode_frame(f0) + enc.encode_frame(f1)
    ry, ru, rv = (np.asarray(x) for x in enc.recon_prev)
    dec = decode_annexb(bs)
    assert len(dec) == 2
    kinds = [m.mb_type for m in dec[1].mbs]
    assert any(k in ("P16x8", "P8x16", "P8x8") for k in kinds), \
        set(kinds)
    np.testing.assert_array_equal(dec[1].y, ry[:H, :W].astype(np.uint8))
    np.testing.assert_array_equal(
        dec[1].u, ru[:H // 2, :W // 2].astype(np.uint8))
    np.testing.assert_array_equal(
        dec[1].v, rv[:H // 2, :W // 2].astype(np.uint8))


def test_partitions_improve_p_frame():
    """Partitions must beat 16x16-only on split-motion content in RD."""
    f0, f1 = _make_pair(W, H, seed=7)
    outs = {}
    for flag in (False, True):
        p = Params(width=W, height=H, qp=28, me_range=8, partitions=flag)
        enc = Encoder(p)
        enc.encode_frame(f0)
        bs = enc.encode_frame(f1)
        ry = np.asarray(enc.recon_prev[0])[:H, :W]
        mse = np.mean((ry.astype(np.int64) - f1.y.astype(np.int64)) ** 2)
        outs[flag] = (len(bs), float(mse))
    bits_off, mse_off = outs[False]
    bits_on, mse_on = outs[True]
    assert bits_on < bits_off or mse_on < mse_off, outs
    # genuine improvement on at least one axis without blowing the other
    assert bits_on < bits_off * 1.05 and mse_on < mse_off * 1.05, outs


def test_partition_chain_with_deblock():
    """IPPP chain with partitions + deblock, every frame bit-exact."""
    frames = []
    f0, f1 = _make_pair(W, H, seed=4)
    f2 = Frame(np.roll(f1.y, 2, axis=1), f1.u.copy(), f1.v.copy())
    frames = [f0, f1, f2]
    p = Params(width=W, height=H, qp=27, me_range=8, partitions=True)
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
