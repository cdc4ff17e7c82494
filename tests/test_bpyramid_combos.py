"""B-pyramid feature combinations the round-3 verdict flagged as
asserted-out: b-pyramid + multi-ref and b-pyramid + temporal/auto
direct. The reference imposes neither exclusion
(x264_validate_parameters, encoder/encoder.c:342-629 clamps but never
forbids them).

Mechanics under test: the BREF enters the sliding window, so B L0
lists are POC-descending over a window that holds reference Bs
(spec 8.2.4.2.3), the next P's one-op reordering still yields
[anchor, BREF, ...] in PicNum order (encoder.c:138-150), and temporal
direct maps the colocated frame's refs into the current L0 by POC
(map_col_to_list0, common/macroblock.c:830-841) — non-identity across
the pyramid, unavailable where the colocated ref has no image in L0
(macroblock.c:199).
"""

import numpy as np
import pytest

from video_steganography_pcamv_tpu.params import Params
from video_steganography_pcamv_tpu.utils.yuv import Frame
from video_steganography_pcamv_tpu.encoder.core import Encoder
from video_steganography_pcamv_tpu.decoder import decode_annexb

W, H = 128, 96


def _pan_frames(n, seed=5, step=2):
    rng = np.random.RandomState(seed)
    pad = 64
    a = rng.randint(20, 236, (H + 2 * pad, W + 2 * pad)).astype(np.uint8)
    for _ in range(3):
        a = ((a.astype(np.int32) + np.roll(a, 1, 0) + np.roll(a, 1, 1)
              + np.roll(np.roll(a, 1, 0), 1, 1)) // 4).astype(np.uint8)
    out = []
    for i in range(n):
        s = step * i
        y = np.ascontiguousarray(a[pad + s:pad + s + H,
                                   pad + 2 * s:pad + 2 * s + W])
        out.append(Frame(y, np.full((H // 2, W // 2), 100, np.uint8),
                         np.full((H // 2, W // 2), 140, np.uint8)))
    return out


def _flicker_frames(n, seed=31, step=2):
    """Pan + per-frame flicker so older refs genuinely win sometimes
    (multi-ref must pick ref > 0)."""
    frames = _pan_frames(n, seed=seed, step=step)
    for i, f in enumerate(frames):
        if i % 2 == 1:
            f.y[:] = np.clip(f.y.astype(np.int32) + 12, 0, 255) \
                .astype(np.uint8)
    return frames


def _roundtrip(p, frames):
    p.validate()
    enc = Encoder(p)
    enc.keep_recon = True
    bs = b"".join(enc.encode_frame(f) for f in frames) + enc.flush()
    dec = decode_annexb(bs)
    assert len(dec) == len(frames)
    for i, d in enumerate(dec):
        ry = enc.recon_by_disp[i][0][:H, :W].astype(np.uint8)
        np.testing.assert_array_equal(d.y, ry, err_msg=f"frame {i}")
        ru = enc.recon_by_disp[i][1][:H // 2, :W // 2].astype(np.uint8)
        np.testing.assert_array_equal(d.u, ru, err_msg=f"frame {i} u")
    return bs, dec, enc


@pytest.mark.parametrize("cabac", [False, True])
@pytest.mark.parametrize("refs", [2, 3])
def test_bpyramid_multiref_roundtrip(cabac, refs):
    # bframes=3 so the pyramid GOP has Bs on BOTH sides of the BREF
    # (late Bs lead L0 with the BREF)
    p = Params(width=W, height=H, qp=26, me_range=8, bframes=3,
               b_adapt=0, b_pyramid=True, ref_frames=refs, cabac=cabac)
    _roundtrip(p, _flicker_frames(13))


def test_bpyramid_multiref_weightb_and_parts():
    p = Params(width=W, height=H, qp=26, me_range=8, bframes=3,
               b_adapt=0, b_pyramid=True, ref_frames=2, weightb=True,
               cabac=True)
    bs, dec, _ = _roundtrip(p, _flicker_frames(13))
    kinds = {m.mb_type for d in dec for m in d.mbs}
    assert kinds & {"B16x8", "B8x16", "B8x8", "B16x16", "BDIRECT",
                    "BSKIP"}, kinds


@pytest.mark.parametrize("refs", [1, 2])
def test_bpyramid_temporal_direct(refs):
    """Temporal direct across the pyramid: early Bs map identically
    through the BREF's list; late Bs need the non-identity
    map_col_to_list0 (anchor L0 idx r -> B L0 idx r+1), which under
    ref=1 makes every inter colocated MB direct-unavailable
    (macroblock.c:199)."""
    p = Params(width=W, height=H, qp=26, me_range=8, bframes=3,
               b_adapt=0, b_pyramid=True, ref_frames=refs, direct=2)
    _roundtrip(p, _flicker_frames(13))


def test_bpyramid_direct_auto():
    p = Params(width=W, height=H, qp=26, me_range=8, bframes=3,
               b_adapt=0, b_pyramid=True, ref_frames=2, direct=3,
               cabac=True)
    _roundtrip(p, _flicker_frames(13))


def test_bpyramid_multiref_ffmpeg_conformant(tmp_path):
    cv2 = pytest.importorskip("cv2")
    p = Params(width=W, height=H, qp=26, me_range=8, bframes=3,
               b_adapt=0, b_pyramid=True, ref_frames=2, cabac=True)
    bs, dec, _ = _roundtrip(p, _flicker_frames(13))
    path = str(tmp_path / "pyr_mref.264")
    with open(path, "wb") as fh:
        fh.write(bs)
    cap = cv2.VideoCapture(path, cv2.CAP_FFMPEG)
    cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
    i = 0
    while True:
        ret, f = cap.read()
        if not ret:
            break
        np.testing.assert_array_equal(f[:H, :W], dec[i].y,
                                      err_msg=f"frame {i}")
        i += 1
    cap.release()
    assert i == len(dec)
