"""Multi-stream lockstep encoder: per-stream bitstreams must decode
bit-exact and match what the single-stream encoder would produce
(device stages vmapped, host state per stream)."""

import numpy as np
import pytest

from video_steganography_pcamv_tpu.params import Params, StegoParams
from video_steganography_pcamv_tpu.utils.yuv import synthetic_sequence
from video_steganography_pcamv_tpu.encoder.core import Encoder
from video_steganography_pcamv_tpu.encoder.multistream import MultiEncoder
from video_steganography_pcamv_tpu.decoder import decode_annexb
from video_steganography_pcamv_tpu.stego.extract import extract_from_stream

W, H = 128, 96


def _params(**kw):
    # intra_in_p off: MultiEncoder doesn't batch the intra refinement
    return Params(width=W, height=H, qp=27, me_range=8,
                  intra_in_p=False, **kw)


def test_multistream_matches_single_stream():
    S, n = 2, 3
    seqs = [synthetic_sequence(W, H, n, seed=10 + s) for s in range(S)]
    me = MultiEncoder(_params(), S)
    multi = [b"" for _ in range(S)]
    for t in range(n):
        chunks = me.encode_step([seqs[s][t] for s in range(S)])
        for s in range(S):
            multi[s] += chunks[s]
    for s in range(S):
        enc = Encoder(_params())
        single = b"".join(enc.encode_frame(f) for f in seqs[s])
        assert multi[s] == single, f"stream {s} diverged"
        dec = decode_annexb(multi[s])
        assert len(dec) == n


def test_multistream_stego_payloads():
    S, n = 2, 4
    seqs = [synthetic_sequence(W, H, n, seed=20 + s) for s in range(S)]
    me = MultiEncoder(
        _params(stego=StegoParams(em_rate=12.0, key=5)), S)
    multi = [b"" for _ in range(S)]
    for t in range(n):
        chunks = me.encode_step([seqs[s][t] for s in range(S)])
        for s in range(S):
            multi[s] += chunks[s]
    for s in range(S):
        got = extract_from_stream(multi[s], em_rate=12.0, key=5)
        sent = me.encs[s]._stego.sent_messages
        assert len(got) == len(sent) == n - 1
        for g, m in zip(got, sent):
            np.testing.assert_array_equal(g, m, err_msg=f"stream {s}")


def test_pipelined_multistream_roundtrip():
    """PipelinedMultiEncoder (single-chip round-robin over the fused
    serving path): per-stream bitstreams decode bit-exact and every
    stream's payload survives blind extraction."""
    import numpy as np
    from video_steganography_pcamv_tpu.encoder.multistream import (
        PipelinedMultiEncoder)
    from video_steganography_pcamv_tpu.params import Params, StegoParams
    from video_steganography_pcamv_tpu.decoder import decode_annexb
    from video_steganography_pcamv_tpu.stego.extract import (
        extract_from_stream)
    from video_steganography_pcamv_tpu.utils.yuv import synthetic_sequence

    S, T, W, H = 2, 5, 96, 64
    p = Params(width=W, height=H, qp=26, me_range=4, keyint_max=30,
               scenecut_threshold=0,
               stego=StegoParams(em_rate=16.0, key=13))
    p.validate()
    me = PipelinedMultiEncoder(p, S)
    seqs = [synthetic_sequence(W, H, T, seed=60 + s) for s in range(S)]
    chunks = [b"" for _ in range(S)]
    for t in range(T):
        for s, c in enumerate(me.encode_step(
                [seqs[s][t] for s in range(S)])):
            chunks[s] += c
    for s, c in enumerate(me.flush()):
        chunks[s] += c
    for s in range(S):
        dec = decode_annexb(chunks[s])
        assert len(dec) == T
        got = extract_from_stream(chunks[s], em_rate=16.0, key=13)
        sent = me.encs[s]._stego.sent_messages
        assert len(got) == len(sent) > 0
        for g, m in zip(got, sent):
            np.testing.assert_array_equal(g, m)
