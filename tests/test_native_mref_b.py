"""Native C++ writers for multi-ref P and B slices must emit byte-
identical streams to the Python oracle writers (checkasm-style
equivalence at whole-slice granularity). deblock=False so the
no-native fallback path (which has no Python deblocker) encodes
against identical references."""

import numpy as np
import pytest

from video_steganography_pcamv_tpu.params import Params, StegoParams
from video_steganography_pcamv_tpu.utils.yuv import Frame
from video_steganography_pcamv_tpu.encoder.core import Encoder
from video_steganography_pcamv_tpu import native

W, H = 96, 64


def _frames(n, seed, flicker=False):
    rng = np.random.RandomState(seed)
    pad = 16
    a = rng.randint(25, 230, (H + 2 * pad, W + 2 * pad)).astype(np.uint8)
    for _ in range(2):
        a = ((a.astype(np.int32) + np.roll(a, 1, 0) + np.roll(a, 1, 1)
              + np.roll(np.roll(a, 1, 0), 1, 1)) // 4).astype(np.uint8)
    b = rng.randint(0, 256, (H, W)).astype(np.uint8)
    u = np.full((H // 2, W // 2), 120, np.uint8)
    out = []
    for i in range(n):
        if flicker and i % 2 == 1:
            yp = b
        else:
            sh = i // 2 if flicker else i
            yp = a[pad + sh:pad + sh + H, pad + 2 * sh:pad + 2 * sh + W]
        out.append(Frame(np.ascontiguousarray(yp), u.copy(), u.copy()))
    return out


def _encode(p, frames, use_native):
    enc = Encoder(p)
    if not use_native:
        enc._native = None
    bs = b""
    for f in frames:
        bs += enc.encode_frame(f)
    bs += enc.flush()
    return bs


@pytest.mark.skipif(native.load() is None, reason="no native lib")
@pytest.mark.parametrize("cabac", [False, True])
def test_mref_native_equals_python(cabac):
    frames = _frames(4, seed=3, flicker=True)
    p = dict(width=W, height=H, qp=26, me_range=4, ref_frames=2,
             cabac=cabac, deblock=False)
    a = _encode(Params(**p), frames, True)
    b = _encode(Params(**p), frames, False)
    assert a == b


@pytest.mark.skipif(native.load() is None, reason="no native lib")
@pytest.mark.parametrize("cabac", [False, True])
def test_b_native_equals_python(cabac):
    frames = _frames(6, seed=5)
    p = dict(width=W, height=H, qp=27, me_range=4, bframes=2,
             cabac=cabac, deblock=False)
    a = _encode(Params(**p), frames, True)
    b = _encode(Params(**p), frames, False)
    assert a == b


@pytest.mark.skipif(native.load() is None, reason="no native lib")
def test_mref_stego_native_equals_python():
    frames = _frames(4, seed=7, flicker=True)
    p = dict(width=W, height=H, qp=26, me_range=4, ref_frames=2,
             deblock=False, stego=StegoParams(em_rate=16.0, key=3))
    a = _encode(Params(**p), frames, True)
    b = _encode(Params(**p), frames, False)
    assert a == b
