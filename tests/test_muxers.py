"""Matroska muxer + WPC simulator tests (reference: matroska.c:276-515,
embed.h:572-591)."""

import struct

import numpy as np

from video_steganography_pcamv_tpu.utils.mkv import (
    MkvWriter, split_annexb, avcc_private)
from video_steganography_pcamv_tpu.stego.wpc import wpc_embed, wpc_capacity


def test_split_annexb():
    # NAL payloads always end nonzero (rbsp_trailing stop bit)
    data = (b"\x00\x00\x00\x01" + b"\x67\x42\x80"
            + b"\x00\x00\x01" + b"\x68\xce"
            + b"\x00\x00\x00\x01" + b"\x65\x88\x01\x02")
    nals = split_annexb(data)
    assert [n[0] & 0x1F for n in nals] == [7, 8, 5]
    assert nals[0] == b"\x67\x42\x80"
    assert nals[2] == b"\x65\x88\x01\x02"


def test_mkv_structure(tmp_path):
    from video_steganography_pcamv_tpu.params import Params
    from video_steganography_pcamv_tpu.utils.yuv import synthetic_sequence
    from video_steganography_pcamv_tpu.encoder.core import Encoder

    frames = synthetic_sequence(64, 48, 3, seed=1)
    p = Params(width=64, height=48, qp=30, me_range=4)
    enc = Encoder(p)
    path = tmp_path / "out.mkv"
    mk = MkvWriter(str(path), 64, 48)
    for f in frames:
        mk.add_frame(enc.encode_frame(f))
    mk.close()
    data = path.read_bytes()
    assert data[:4] == bytes.fromhex("1A45DFA3")      # EBML magic
    assert b"matroska" in data[:64]
    assert b"V_MPEG4/ISO/AVC" in data
    assert data.count(bytes.fromhex("1F43B675")) >= 3  # 3 clusters
    # duration patched (non-zero float after the 0x4489 id)
    i = data.find(bytes.fromhex("4489"))
    dur = struct.unpack(">f", data[i + 3:i + 7])[0]
    assert abs(dur - 3000.0 / 25.0) < 1.0


def test_mp4_roundtrip(tmp_path):
    """MP4 mux -> demux -> decode must reproduce the exact recon the
    raw Annex-B stream decodes to (reference MP4 seam muxers.c:441+)."""
    from video_steganography_pcamv_tpu.params import Params
    from video_steganography_pcamv_tpu.utils.yuv import synthetic_sequence
    from video_steganography_pcamv_tpu.encoder.core import Encoder
    from video_steganography_pcamv_tpu.utils.mp4 import (Mp4Writer,
                                                         demux_mp4)
    from video_steganography_pcamv_tpu.decoder import decode_annexb

    frames = synthetic_sequence(64, 48, 5, seed=2)
    p = Params(width=64, height=48, qp=30, me_range=4, bframes=1,
               b_adapt=0, scenecut_threshold=0)
    enc = Encoder(p)
    path = tmp_path / "out.mp4"
    mp = Mp4Writer(str(path), 64, 48, p.fps_num, p.fps_den)
    raw = b""
    for f in frames:
        for disp, chunk, kind in enc.encode_frame_aus(f):
            mp.add_frame(chunk, timecode_ms=disp * 40)
            raw += chunk
    for disp, chunk, kind in enc.flush_aus():
        mp.add_frame(chunk, timecode_ms=disp * 40)
        raw += chunk
    mp.close()
    data = path.read_bytes()
    assert data[4:8] == b"ftyp"
    assert b"moov" in data and b"avcC" in data
    assert b"ctts" in data      # B reorder -> composition offsets
    demuxed = demux_mp4(data)
    d1 = decode_annexb(demuxed)
    d2 = decode_annexb(raw)
    assert len(d1) == len(d2) == 5
    for a, b in zip(d1, d2):
        np.testing.assert_array_equal(a.y, b.y)
        np.testing.assert_array_equal(a.u, b.u)
        np.testing.assert_array_equal(a.v, b.v)


def test_avcc_private():
    sps = bytes([0x67, 66, 0, 30, 1, 2, 3])
    pps = bytes([0x68, 0xCE, 0x38, 0x80])
    pv = avcc_private(sps, pps)
    assert pv[0] == 1 and pv[1] == 66 and pv[3] == 30
    assert struct.unpack(">H", pv[6:8])[0] == len(sps)


def test_wpc_simulator():
    rng = np.random.RandomState(0)
    cover = rng.randint(0, 2, 1000).astype(np.uint8)
    wet = rng.rand(1000) < 0.4
    stego = wpc_embed(cover, wet, key=7)
    assert np.array_equal(stego[wet], cover[wet])   # wet untouched
    flips = int((stego[~wet] != cover[~wet]).sum())
    dry = wpc_capacity(wet)
    assert 0.35 * dry < flips < 0.65 * dry          # ~p=0.5
    # deterministic per key
    assert np.array_equal(stego, wpc_embed(cover, wet, key=7))
    assert not np.array_equal(stego, wpc_embed(cover, wet, key=8))
