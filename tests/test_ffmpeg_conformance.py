"""Independent third-party decoder conformance via OpenCV's FFmpeg
backend (the reference's gold standard is encode -> independent decode
-> diff recon, doc/regression_test.txt:1-26; JM there, FFmpeg/libavcodec
here).

Channel quality: with CAP_PROP_CONVERT_RGB=0 the FFmpeg capture hands
back the decoded LUMA plane verbatim (bit-exact comparison); chroma is
only reachable through the BGR conversion, so it is checked against our
own recon pushed through cv2's I420->BGR converter with a small rounding
tolerance (sws_scale vs cvtColor differ by <=2 LSB on conformant input;
a real chroma recon bug produces tens of LSBs).

Both sides of the diff: libavcodec decode vs this repo's decoder
(decode_annexb), which in turn is proven equal to the encoder recon by
the per-feature e2e suites - so a green run here ties encoder recon to
an independently implemented decoder."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from video_steganography_pcamv_tpu.params import Params, StegoParams
from video_steganography_pcamv_tpu.utils.yuv import Frame
from video_steganography_pcamv_tpu.encoder.core import Encoder
from video_steganography_pcamv_tpu.decoder import decode_annexb
from video_steganography_pcamv_tpu.stego.extract import extract_from_stream

W, H = 96, 64


def _frames(n, w=W, h=H, seed=0):
    rng = np.random.RandomState(seed)
    pad = 4 * n + 16
    a = rng.randint(16, 240, (h + 2 * pad, w + 2 * pad)).astype(np.uint8)
    for _ in range(2):
        a = ((a.astype(np.int32) + np.roll(a, 1, 0) + np.roll(a, 1, 1)
              + np.roll(np.roll(a, 1, 0), 1, 1)) // 4).astype(np.uint8)
    out = []
    for i in range(n):
        yp = a[pad + i:pad + i + h, pad + 2 * i:pad + 2 * i + w]
        noise = (rng.randn(h, w) * 3).astype(np.int32)
        yp = np.clip(yp.astype(np.int32) + noise, 0, 255).astype(np.uint8)
        u = np.clip(110 + (yp[::2, ::2].astype(np.int32) - 128) // 4,
                    0, 255).astype(np.uint8)
        v = np.clip(140 - (yp[::2, ::2].astype(np.int32) - 128) // 4,
                    0, 255).astype(np.uint8)
        out.append(Frame(yp.copy(), u, v))
    return out


def _encode(cfg, frames, w=W, h=H):
    p = Params(width=w, height=h, me_range=8, **cfg)
    enc = Encoder(p)
    bs = b"".join(enc.encode_frame(f) for f in frames) + enc.flush()
    return enc, bs


def _cv2_luma(path, n_expect, w, h):
    """Decoded luma planes via FFmpeg, display order, cropped to w x h."""
    cap = cv2.VideoCapture(path, cv2.CAP_FFMPEG)
    assert cap.isOpened(), "FFmpeg backend failed to open the stream"
    cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
    out = []
    while True:
        ret, f = cap.read()
        if not ret:
            break
        assert f.ndim == 2, f"expected raw 8UC1 luma, got {f.shape}"
        out.append(f[:h, :w].copy())
    cap.release()
    assert len(out) == n_expect, (
        f"FFmpeg decoded {len(out)} frames, expected {n_expect}")
    return out


def _cv2_bgr(path, n_expect):
    cap = cv2.VideoCapture(path, cv2.CAP_FFMPEG)
    assert cap.isOpened()
    out = []
    while True:
        ret, f = cap.read()
        if not ret:
            break
        out.append(f.copy())
    cap.release()
    assert len(out) == n_expect
    return out


def _check_stream(bs, n, tmp_path, w=W, h=H):
    path = str(tmp_path / "conf.264")
    with open(path, "wb") as fh:
        fh.write(bs)
    ours = decode_annexb(bs)
    assert len(ours) == n
    lumas = _cv2_luma(path, n, w, h)
    for i, (ff, d) in enumerate(zip(lumas, ours)):
        np.testing.assert_array_equal(
            ff, d.y, err_msg=f"frame {i}: FFmpeg luma != repo decode")
    # chroma via the BGR channel: our recon through cv2's own converter
    # must match FFmpeg's sws_scale output within conversion rounding.
    for i, (bgr, d) in enumerate(zip(_cv2_bgr(path, n), ours)):
        i420 = np.concatenate(
            [d.y[:h, :w].reshape(-1), d.u[:h // 2, :w // 2].reshape(-1),
             d.v[:h // 2, :w // 2].reshape(-1)]).reshape(h * 3 // 2, w)
        mine = cv2.cvtColor(i420, cv2.COLOR_YUV2BGR_I420)
        diff = np.abs(bgr[:h, :w].astype(int) - mine.astype(int))
        assert diff.max() <= 3 and diff.mean() < 1.5, (
            f"frame {i}: BGR divergence max={diff.max()} "
            f"mean={diff.mean():.2f} - chroma recon drift vs FFmpeg")
    return ours


CONFIGS = [
    ("cavlc-p", dict(qp=26)),
    ("cabac", dict(qp=26, cabac=True)),
    ("high-8x8", dict(qp=26, cabac=True, transform_8x8=True)),
    ("b-pyramid-weightb", dict(qp=27, bframes=3, b_adapt=0,
                               b_pyramid=True, weightb=True, cabac=True)),
    ("aq-deblock-offsets", dict(qp=25, aq_mode=1, aq_strength=1.3,
                                deblock_alpha=2, deblock_beta=-1)),
    ("mref-p4x4", dict(qp=26, ref_frames=3, partitions=True, p4x4=True)),
    ("trellis-cqm-8x8", dict(qp=26, cabac=True, transform_8x8=True,
                             trellis=1, cqm="jvt")),
    ("crf-b", dict(crf=28.0, bframes=1, cabac=True)),
]


@pytest.mark.slow
@pytest.mark.parametrize("cfg", [c for _, c in CONFIGS],
                         ids=[n for n, _ in CONFIGS])
def test_ffmpeg_decode_matches_repo(cfg, tmp_path):
    n = 8
    frames = _frames(n, seed=sum(map(ord, str(sorted(cfg.items())))))
    _, bs = _encode(cfg, frames)
    _check_stream(bs, n, tmp_path)


@pytest.mark.slow
def test_ffmpeg_decode_stego_stream(tmp_path):
    """The headline feature: an embedded stream is (a) decodable by an
    independent decoder bit-exactly and (b) still carries its payload."""
    n = 6
    frames = _frames(n, seed=77)
    cfg = dict(qp=26, partitions=True,
               stego=StegoParams(em_rate=16.0, key=5))
    enc, bs = _encode(cfg, frames)
    _check_stream(bs, n, tmp_path)
    got = extract_from_stream(bs, em_rate=16.0, key=5)
    sent = enc._stego.sent_messages
    assert len(got) == len(sent)
    for g, s in zip(got, sent):
        np.testing.assert_array_equal(g, s)


@pytest.mark.slow
def test_ffmpeg_decode_cropped_dims(tmp_path):
    """Non-mod16 dimensions: SPS frame cropping must round-trip through
    libavcodec (it honors crop and returns the display size)."""
    w, h = 90, 62
    n = 5
    frames = _frames(n, w=w, h=h, seed=11)
    _, bs = _encode(dict(qp=26), frames, w=w, h=h)
    path = str(tmp_path / "crop.264")
    with open(path, "wb") as fh:
        fh.write(bs)
    ours = decode_annexb(bs)
    cap = cv2.VideoCapture(path, cv2.CAP_FFMPEG)
    assert cap.isOpened()
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == w
    assert int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) == h
    cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
    i = 0
    while True:
        ret, f = cap.read()
        if not ret:
            break
        np.testing.assert_array_equal(f[:h, :w], ours[i].y[:h, :w])
        i += 1
    cap.release()
    assert i == n


@pytest.mark.slow
def test_ffmpeg_decode_occlusion_intra_in_p(tmp_path):
    """Busy content (moving rectangles -> occlusions -> intra-in-P MBs
    with inter neighbours) at a mid QP. Regression for the round-3
    intra-neighbour MVP/P_SKIP availability bug: intra neighbours must
    join MVP as available (mv 0 / ref -1, x264 cache -1 vs -2) — the
    old unavailable-like treatment desynced every MV downstream of an
    intra MB and only FFmpeg could see it (encoder and decoder shared
    the convention)."""
    from video_steganography_pcamv_tpu.utils.yuv import (
        synthetic_sequence)
    frames = synthetic_sequence(160, 96, 10, seed=4)
    for cabac in (False, True):
        p = Params(width=160, height=96, me_range=16, qp=28,
                   partitions=True, cabac=cabac)
        enc = Encoder(p)
        bs = b"".join(enc.encode_frame(f) for f in frames) + enc.flush()
        path = str(tmp_path / f"occl{int(cabac)}.264")
        with open(path, "wb") as fh:
            fh.write(bs)
        ours = decode_annexb(bs)
        lumas = _cv2_luma(path, 10, 160, 96)
        for i, (ff, d) in enumerate(zip(lumas, ours)):
            np.testing.assert_array_equal(
                ff, d.y[:96, :160],
                err_msg=f"cabac={cabac} frame {i}")


@pytest.mark.slow
def test_ffmpeg_decode_occlusion_intra_in_b(tmp_path):
    """Busy content with B frames: occlusions force intra-in-B MBs with
    inter neighbours. Regression for the round-3 B-path desync of the
    intra-neighbour availability convention (intra neighbours are
    AVAILABLE with mv 0 / ref -1 in BOTH list grids of the B scans,
    matching the decoder's dec4/ref4 state; x264 cache -1 vs -2,
    macroblock.c:28-46). Verified against FFmpeg so a future symmetric
    encoder+decoder desync cannot hide."""
    from video_steganography_pcamv_tpu.utils.yuv import (
        synthetic_sequence)
    frames = synthetic_sequence(160, 96, 9, seed=4)
    for cabac, parts in ((False, True), (True, False)):
        p = Params(width=160, height=96, me_range=16, qp=28,
                   bframes=2, b_adapt=0, partitions=parts, cabac=cabac)
        enc = Encoder(p)
        bs = b"".join(enc.encode_frame(f) for f in frames) + enc.flush()
        path = str(tmp_path / f"occlb{int(cabac)}.264")
        with open(path, "wb") as fh:
            fh.write(bs)
        ours = decode_annexb(bs)
        lumas = _cv2_luma(path, 9, 160, 96)
        for i, (ff, d) in enumerate(zip(lumas, ours)):
            np.testing.assert_array_equal(
                ff, d.y[:96, :160],
                err_msg=f"cabac={cabac} parts={parts} frame {i}")
