"""Multi-device mesh test: full encode+embed -> blind-extract round
trip with every device stage sharded over an 8-device mesh (one stream
per device), on the virtual CPU mesh provisioned by conftest.py.

Reference analog: x264's frame-parallel threading protocol
(/root/reference/encoder/encoder.c:2358-2362, doc/threads.txt) — here
the parallel axis is independent streams over mesh devices instead of
frames over pthreads.
"""

import numpy as np
import jax
import pytest

from video_steganography_pcamv_tpu.params import Params, StegoParams
from video_steganography_pcamv_tpu.parallel.mesh import (
    build_mesh, build_multi_encoder)
from video_steganography_pcamv_tpu.stego.extract import extract_from_stream
from video_steganography_pcamv_tpu.utils.yuv import synthetic_sequence


@pytest.mark.slow
def test_mesh_encode_extract_roundtrip():
    n = 8
    assert len(jax.devices()) >= n, "conftest must provision 8 devices"
    mesh = build_mesh(n)
    w, h = 64, 64
    em_rate = 16.0
    p = Params(width=w, height=h, qp=26, me_range=4, keyint_max=30,
               stego=StegoParams(em_rate=em_rate, key=7))
    menc = build_multi_encoder(p, mesh)

    streams = [synthetic_sequence(w, h, 3, seed=20 + i)
               for i in range(n)]
    chunks = [b"" for _ in range(n)]
    for t in range(3):
        outs = menc.encode_step([st[t] for st in streams])
        for i, c in enumerate(outs):
            chunks[i] = chunks[i] + c

    # the stacked reference really is sharded across all mesh devices
    ref_sharding = menc._refs["luma"].sharding
    assert len(ref_sharding.device_set) == n, ref_sharding

    total_bits = 0
    for i, e in enumerate(menc.encs):
        got = extract_from_stream(chunks[i], em_rate=em_rate, key=7)
        sent = e._stego.sent_messages
        assert len(got) == len(sent)
        for g, m in zip(got, sent):
            assert np.array_equal(g, m), f"stream {i} payload mismatch"
        total_bits += sum(len(m) for m in sent)
    assert total_bits == n * 2 * int(em_rate)  # 2 P frames per stream
