"""Rate control + lookahead tests (reference: encoder/ratecontrol.c,
encoder/slicetype.c). ABR convergence, CRF monotonicity, VBV caps,
2-pass allocation, scenecut IDR insertion, qpfile forcing — all e2e
through the real encoder + conformance decoder on small frames."""

import os

import numpy as np
import pytest

from video_steganography_pcamv_tpu.params import Params
from video_steganography_pcamv_tpu.utils.yuv import synthetic_sequence, Frame
from video_steganography_pcamv_tpu.encoder.core import Encoder
from video_steganography_pcamv_tpu.decoder import decode_annexb

W, H = 128, 96
FPS = 25.0


def _encode(frames, p):
    enc = Encoder(p)
    chunks = [enc.encode_frame(f) for f in frames]
    return enc, b"".join(chunks)


def _decode_ok(bs, n):
    dec = decode_annexb(bs)
    assert len(dec) == n
    return dec


def test_abr_hits_target_bitrate():
    n = 24
    frames = synthetic_sequence(W, H, n, seed=3)
    target_kbps = 220
    p = Params(width=W, height=H, bitrate=target_kbps, keyint_max=50,
               me_range=8)
    enc, bs = _encode(frames, p)
    _decode_ok(bs, n)
    kbps = len(bs) * 8 * FPS / n / 1000.0
    # 1-pass ABR without lookahead: x264 tolerance is loose; 40% here
    assert abs(kbps - target_kbps) / target_kbps < 0.40, kbps
    # per-frame QPs must vary (feedback active) and stay in range
    assert enc.rc.frame_num == n


def test_crf_monotonic_bits():
    n = 6
    frames = synthetic_sequence(W, H, n, seed=4)
    sizes = []
    for crf in (20.0, 30.0, 40.0):
        p = Params(width=W, height=H, crf=crf, me_range=8)
        _, bs = _encode(frames, p)
        _decode_ok(bs, n)
        sizes.append(len(bs))
    assert sizes[0] > sizes[1] > sizes[2], sizes


def test_vbv_caps_frame_sizes():
    n = 16
    frames = synthetic_sequence(W, H, n, seed=5)
    p = Params(width=W, height=H, bitrate=150, vbv_maxrate=150,
               vbv_bufsize=80, keyint_max=50, me_range=8)
    enc = Encoder(p)
    sizes = [len(enc.encode_frame(f)) * 8 for f in frames]
    # after warmup, no frame may exceed the whole VBV buffer
    assert max(sizes[2:]) <= 80_000, sizes


def test_two_pass_improves_accuracy(tmp_path):
    n = 20
    frames = synthetic_sequence(W, H, n, seed=6)
    target_kbps = 200
    stat = str(tmp_path / "pass1.stats")
    p1 = Params(width=W, height=H, bitrate=target_kbps, keyint_max=50,
                me_range=8, stat_out=stat)
    enc1, bs1 = _encode(frames, p1)
    enc1.close()
    assert os.path.exists(stat)
    p2 = Params(width=W, height=H, bitrate=target_kbps, keyint_max=50,
                me_range=8, stat_in=stat)
    enc2, bs2 = _encode(frames, p2)
    _decode_ok(bs2, n)
    err1 = abs(len(bs1) * 8 * FPS / n / 1000.0 - target_kbps)
    err2 = abs(len(bs2) * 8 * FPS / n / 1000.0 - target_kbps)
    assert err2 <= err1 + 8, (err1, err2)  # pass 2 no worse (slack 8kbps)


def test_scenecut_inserts_idr():
    a = synthetic_sequence(W, H, 4, seed=7)
    b = synthetic_sequence(W, H, 4, seed=99)  # unrelated content = cut
    frames = a + b
    p = Params(width=W, height=H, qp=28, keyint_max=250, keyint_min=1,
               me_range=8)
    enc, bs = _encode(frames, p)
    assert enc.stats.i_frames >= 2, "scenecut should force an IDR"
    _decode_ok(bs, len(frames))


def test_qpfile_forces_types_and_qp(tmp_path):
    n = 6
    frames = synthetic_sequence(W, H, n, seed=8)
    qpf = tmp_path / "qpfile.txt"
    qpf.write_text("0 I 30\n3 I 40\n4 P 35\n")
    p = Params(width=W, height=H, qp=28, keyint_max=250,
               scenecut_threshold=0, me_range=8, qpfile=str(qpf))
    enc, bs = _encode(frames, p)
    _decode_ok(bs, n)
    assert enc.stats.i_frames == 2


def test_abr_stego_roundtrip():
    """Rate control + embedding together: payload must survive
    QP-varying frames (per-frame lambda/qp plumbed through the stego
    cost path)."""
    from video_steganography_pcamv_tpu.params import StegoParams
    from video_steganography_pcamv_tpu.stego.extract import (
        extract_from_stream)
    n = 8
    frames = synthetic_sequence(W, H, n, seed=9)
    p = Params(width=W, height=H, bitrate=260, keyint_max=50, me_range=8,
               stego=StegoParams(em_rate=16.0, key=42))
    enc, bs = _encode(frames, p)
    got = extract_from_stream(bs, em_rate=16.0, key=42)
    sent = enc._stego.sent_messages
    assert len(got) == len(sent)
    for g, s in zip(got, sent):
        np.testing.assert_array_equal(g, s)
