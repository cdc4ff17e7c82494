"""Stego end-to-end: embed during encode, blind-extract from the
bitstream, verify 100%% message recovery + conformant reconstruction."""

import numpy as np
import pytest

from video_steganography_pcamv_tpu.params import Params, StegoParams
from video_steganography_pcamv_tpu.utils.yuv import synthetic_sequence
from video_steganography_pcamv_tpu.encoder.core import Encoder
from video_steganography_pcamv_tpu.decoder import decode_annexb
from video_steganography_pcamv_tpu.stego.extract import extract_from_stream


def _run(w=80, h=64, n=4, qp=26, em_rate=16.0, key=42, seed=13):
    frames = synthetic_sequence(w, h, n, seed=seed)
    p = Params(width=w, height=h, qp=qp, me_range=8,
               stego=StegoParams(em_rate=em_rate, key=key))
    enc = Encoder(p)
    chunks, recons = [], []
    for f in frames:
        chunks.append(enc.encode_frame(f))
        recons.append(tuple(np.array(x) for x in enc.recon_prev))
    return enc, b"".join(chunks), recons, p


def test_embed_extract_roundtrip():
    enc, bs, recons, p = _run(em_rate=16.0)
    got = extract_from_stream(bs, em_rate=16.0, key=42)
    sent = enc._stego.sent_messages
    assert len(got) == len(sent) == 3  # 3 P frames
    for i, (g, s) in enumerate(zip(got, sent)):
        assert len(s) > 0, f"frame {i}: nothing embedded"
        np.testing.assert_array_equal(g, s, err_msg=f"frame {i} payload")
    assert enc.stats.mv_flips > 0  # something actually flipped


def test_embed_recon_still_conformant():
    """Flipped MVs must not break encoder/decoder recon equality."""
    enc, bs, recons, p = _run(em_rate=32.0)
    dec = decode_annexb(bs)
    w, h = p.width, p.height
    for i, d in enumerate(dec):
        ry, ru, rv = recons[i]
        np.testing.assert_array_equal(
            d.y, ry[:h, :w].astype(np.uint8),
            err_msg=f"frame {i} luma recon mismatch with embedding")


def test_rate_fraction_of_covers():
    """em_rate <= 1 means bits per cover MV (encoder.c:1830-1836)."""
    enc, bs, _, _ = _run(em_rate=0.5)
    got = extract_from_stream(bs, em_rate=0.5, key=42)
    sent = enc._stego.sent_messages
    for g, s in zip(got, sent):
        np.testing.assert_array_equal(g, s)


def test_psnr_impact_is_small():
    frames = synthetic_sequence(96, 80, 4, seed=3)

    def encode(emrate):
        p = Params(width=96, height=80, qp=26, me_range=8,
                   stego=StegoParams(em_rate=emrate, key=9))
        e = Encoder(p)
        for f in frames:
            e.encode_frame(f)
        return e.close()

    clean = encode(0.0)
    stego = encode(24.0)
    assert stego["psnr_y"] > clean["psnr_y"] - 0.6, (clean, stego)


def test_key_seeds_message_extraction_is_blind():
    """Since the bit-parity STC change the parity-check matrix is the
    reference's fixed mats[] table (embed.h:11-132 — the reference has
    no key concept; its message comes from unseeded rand(),
    encoder.c:1839). Our --key seeds the message PRNG only: extraction
    is blind (recovers the embedded bits under ANY key), and different
    keys embed different messages."""
    enc, bs, _, _ = _run(em_rate=16.0, key=42)
    sent = enc._stego.sent_messages
    # blind: a mismatched key still recovers what was embedded
    got = extract_from_stream(bs, em_rate=16.0, key=43)
    for g, s in zip(got, sent):
        np.testing.assert_array_equal(g, s)
    # but the key changes the generated payload itself
    enc2, _, _, _ = _run(em_rate=16.0, key=43)
    sent2 = enc2._stego.sent_messages
    assert any(not np.array_equal(a, b) for a, b in zip(sent, sent2))
