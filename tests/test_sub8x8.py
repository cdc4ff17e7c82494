"""Sub-8x8 partitions (P_8x8 sub_mb_types 8x4/4x8/4x4) end-to-end.

Reference model: the p4x4/p8x4/p4x8 analysis helpers
(analyse.c:1569-1693), sub_mb_pred syntax (spec 7.3.5.2), and the
D_L0_8x4/4x8/4x4 stego cover cases (analyse.c:3518-3689). Content is
built with per-4x4-block motion so sub splits win.
"""

import numpy as np
import pytest

from video_steganography_pcamv_tpu.params import Params, StegoParams
from video_steganography_pcamv_tpu.utils.yuv import Frame
from video_steganography_pcamv_tpu.encoder.core import Encoder
from video_steganography_pcamv_tpu.decoder import decode_annexb

W, H = 96, 64


def _make_pair(w, h, seed=0):
    """Frame pair where 4x4 blocks move individually (directions cycle
    per block) — 8x8-uniform ME must lose, sub splits win."""
    rng = np.random.RandomState(seed)
    pad = 16
    big = rng.randint(30, 226, (h + 2 * pad, w + 2 * pad)).astype(np.uint8)
    # smooth a bit so subpel interpolation is meaningful
    big = ((big.astype(np.int32)
            + np.roll(big, 1, 0) + np.roll(big, 1, 1)
            + np.roll(np.roll(big, 1, 0), 1, 1)) // 4).astype(np.uint8)
    f0 = big[pad:pad + h, pad:pad + w].copy()
    f1 = np.zeros((h, w), np.uint8)
    moves = [(0, 1), (1, -1), (-1, 0), (2, 1), (0, -2), (-1, 2)]
    for j in range(h // 4):
        for i in range(w // 4):
            dy, dx = moves[(j * (w // 4) + i) % len(moves)]
            f1[4 * j:4 * j + 4, 4 * i:4 * i + 4] = \
                big[pad + 4 * j + dy:pad + 4 * j + dy + 4,
                    pad + 4 * i + dx:pad + 4 * i + dx + 4]
    u = np.full((h // 2, w // 2), 128, np.uint8)
    v = np.full((h // 2, w // 2), 128, np.uint8)
    return Frame(f0, u, v), Frame(f1, u.copy(), v.copy())


def _assert_conformance(bs, enc, n_frames):
    dec = decode_annexb(bs)
    assert len(dec) == n_frames
    ry, ru, rv = (np.asarray(x) for x in enc.recon_prev)
    np.testing.assert_array_equal(dec[-1].y, ry[:H, :W].astype(np.uint8))
    np.testing.assert_array_equal(
        dec[-1].u, ru[:H // 2, :W // 2].astype(np.uint8))
    np.testing.assert_array_equal(
        dec[-1].v, rv[:H // 2, :W // 2].astype(np.uint8))
    return dec


def test_unit_id_map():
    from video_steganography_pcamv_tpu.encoder.partition import (
        unit_id_map)
    from video_steganography_pcamv_tpu.encoder.scan import mb_units
    import jax.numpy as jnp
    rng = np.random.RandomState(3)
    part = rng.randint(0, 4, (2, 3)).astype(np.int32)
    sub = rng.randint(0, 4, (2, 3, 4)).astype(np.int32)
    uid = np.asarray(unit_id_map(jnp.asarray(part), jnp.asarray(sub)))
    for my in range(2):
        for mx in range(3):
            ref = np.zeros(16, np.int32)
            for (oy, ox, w4, h4) in mb_units(int(part[my, mx]),
                                             sub[my, mx]):
                s = 4 * (2 * (oy >> 1) + (ox >> 1)) + 2 * (oy & 1) + (ox & 1)
                for jj in range(oy, oy + h4):
                    for ii in range(ox, ox + w4):
                        z = (4 * (2 * (jj >> 1) + (ii >> 1))
                             + 2 * (jj & 1) + (ii & 1))
                        ref[z] = s
            np.testing.assert_array_equal(uid[my, mx], ref,
                                          err_msg=f"{part[my, mx]}")


@pytest.mark.parametrize("cabac", [False, True])
def test_sub8x8_roundtrip_bitexact(cabac):
    f0, f1 = _make_pair(W, H, seed=2)
    p = Params(width=W, height=H, qp=26, me_range=4, p4x4=True,
               cabac=cabac)
    enc = Encoder(p)
    bs = enc.encode_frame(f0) + enc.encode_frame(f1)
    dec = _assert_conformance(bs, enc, 2)
    # sub splits must actually be used on this content
    part = enc.last_frame_info["part"]
    assert (part == 3).any()
    subs = enc._last_sub_types
    assert (subs[part == 3] > 0).any(), (part, subs)


def test_sub8x8_chain_with_deblock():
    f0, f1 = _make_pair(W, H, seed=5)
    f2 = Frame(np.roll(f1.y, 1, axis=0), f1.u.copy(), f1.v.copy())
    p = Params(width=W, height=H, qp=28, me_range=4, p4x4=True)
    enc = Encoder(p)
    bs = b""
    recons = []
    for f in (f0, f1, f2):
        bs += enc.encode_frame(f)
        recons.append(tuple(np.asarray(x) for x in enc.recon_prev))
    dec = decode_annexb(bs)
    for i, d in enumerate(dec):
        np.testing.assert_array_equal(
            d.y, recons[i][0][:H, :W].astype(np.uint8),
            err_msg=f"frame {i} luma")


def test_sub8x8_improves_on_fine_motion():
    """Sub splits must beat 8x8-uniform partitions on per-4x4 motion."""
    f0, f1 = _make_pair(W, H, seed=7)
    outs = {}
    for flag in (False, True):
        p = Params(width=W, height=H, qp=28, me_range=4, p4x4=flag)
        enc = Encoder(p)
        enc.encode_frame(f0)
        bs = enc.encode_frame(f1)
        ry = np.asarray(enc.recon_prev[0])[:H, :W]
        mse = np.mean((ry.astype(np.int64) - f1.y.astype(np.int64)) ** 2)
        outs[flag] = (len(bs), float(mse))
    bits_off, mse_off = outs[False]
    bits_on, mse_on = outs[True]
    assert bits_on < bits_off or mse_on < mse_off, outs
    assert bits_on < bits_off * 1.05 and mse_on < mse_off * 1.10, outs


@pytest.mark.parametrize("cabac", [False, True])
def test_sub8x8_stego_roundtrip(cabac):
    """Embed + blind-extract with the cover spanning sub-unit MVs."""
    from video_steganography_pcamv_tpu.stego.extract import (
        extract_from_stream)
    f0, f1 = _make_pair(W, H, seed=11)
    f2 = Frame(np.roll(f1.y, 1, axis=1), f1.u.copy(), f1.v.copy())
    p = Params(width=W, height=H, qp=26, me_range=4, p4x4=True,
               cabac=cabac,
               stego=StegoParams(em_rate=24.0, key=77))
    enc = Encoder(p)
    bs = b""
    for f in (f0, f1, f2):
        bs += enc.encode_frame(f)
    ry = np.asarray(enc.recon_prev[0])
    dec = decode_annexb(bs)
    np.testing.assert_array_equal(dec[-1].y, ry[:H, :W].astype(np.uint8))
    got = extract_from_stream(bs, em_rate=24.0, key=77)
    sent = enc._stego.sent_messages
    assert len(got) == len(sent)
    for g, s in zip(got, sent):
        np.testing.assert_array_equal(g, s)
    assert enc.stats.mv_flips > 0


@pytest.mark.parametrize("refs", [2, 3])
def test_sub8x8_stego_multiref_roundtrip(refs):
    """Multi-ref + sub-8x8 + embedding (the last round-3 combination
    gate): the RCA probe tables gather from each block's own DPB
    entry, flips alternate MVs but never refs (analyse.c:3518 model),
    the forced rescan re-commits the pass-1 refs so ref-matched MVPs
    stay live, and the pass-2 re-encode MCs from the per-block ref.
    Blind extraction must recover every message bit and the stream
    must stay bit-exact vs the repo decoder."""
    from video_steganography_pcamv_tpu.stego.extract import (
        extract_from_stream)
    f0, f1 = _make_pair(W, H, seed=19)
    frames = [f0, f1]
    # flicker so older refs genuinely win on some blocks
    for i in range(2, 6):
        y = np.roll(frames[-1].y, (1, -1), axis=(0, 1))
        if i % 2:
            y = np.clip(y.astype(np.int32) + 10, 0, 255).astype(np.uint8)
        frames.append(Frame(y, f0.u.copy(), f0.v.copy()))
    p = Params(width=W, height=H, qp=26, me_range=4, p4x4=True,
               ref_frames=refs,
               stego=StegoParams(em_rate=16.0, key=99))
    p.validate()
    enc = Encoder(p)
    enc.keep_recon = True
    bs = b"".join(enc.encode_frame(f) for f in frames)
    dec = decode_annexb(bs)
    for i, d in enumerate(dec):
        ry = enc.recon_by_disp[i][0][:H, :W].astype(np.uint8)
        np.testing.assert_array_equal(d.y, ry, err_msg=f"frame {i}")
    got = extract_from_stream(bs, em_rate=16.0, key=99)
    sent = enc._stego.sent_messages
    assert len(got) == len(sent)
    for g, s in zip(got, sent):
        np.testing.assert_array_equal(g, s)
    assert enc.stats.mv_flips > 0
