"""Intra-in-B end-to-end (VERDICT #5 remainder).

Reference model: the B path of x264_macroblock_analyse considers
intra modes for B MBs too (analyse.c:3166-3179 B intra compare) and
the entropy coders carry intra mb_types in B slices (spec 7.4.5:
B mb_type 23 = I_NxN, 24..47 = I_16x16; CABAC Table 9-37 prefix
111101 + I-slice suffix, reference encoder/cabac.c:146-156).

Our design: after the batched B encode, refine_p_intra runs over the
committed recon and switches MBs where intra SATD beats the committed
inter cost; a raster rescan re-derives mvd with intra MBs uncommitted
(unavailable to neighbour MVP/direct). MBs that a later direct-coded
MB reads as neighbour A/B/C/D are masked off — switching them would
change the dependent's spatial-direct derivation and desync recon.
"""

import numpy as np
import pytest

from video_steganography_pcamv_tpu.params import Params
from video_steganography_pcamv_tpu.utils.yuv import Frame
from video_steganography_pcamv_tpu.encoder.core import Encoder
from video_steganography_pcamv_tpu.decoder import decode_annexb

W, H = 96, 64


def _chroma():
    return (np.full((H // 2, W // 2), 110, np.uint8),
            np.full((H // 2, W // 2), 140, np.uint8))


def _novel_b_frames(seed=0, mixed=False):
    """Anchors = noise; B frame = smooth gradient (novel content the
    anchors cannot predict -> intra wins). mixed=True keeps the left
    half of the B frame identical to the anchors (inter/direct wins
    there), exercising intra+inter+direct in one slice."""
    rng = np.random.RandomState(seed)
    noise = rng.randint(0, 256, (H, W)).astype(np.uint8)
    grad = (np.arange(H)[:, None] * 2
            + np.arange(W)[None, :]).astype(np.uint8)
    bmid = grad.copy()
    if mixed:
        bmid[:, :W // 2] = noise[:, :W // 2]
    u, v = _chroma()
    return [Frame(noise.copy(), u.copy(), v.copy()),
            Frame(bmid, u.copy(), v.copy()),
            Frame(noise.copy(), u.copy(), v.copy())]


def _roundtrip(frames, **kw):
    p = Params(width=W, height=H, qp=28, me_range=4, bframes=1,
               b_adapt=0, scenecut_threshold=0, **kw)
    enc = Encoder(p)
    enc.keep_recon = True
    bs = b"".join(enc.encode_frame(f) for f in frames) + enc.flush()
    dec = decode_annexb(bs)
    assert len(dec) == len(frames)
    assert 1 in [d.slice_type for d in dec], "no B slice"
    for i, d in enumerate(dec):
        ry, ru, rv = enc.recon_by_disp[i]
        np.testing.assert_array_equal(
            d.y, ry[:H, :W].astype(np.uint8), err_msg=f"frame {i} luma")
        np.testing.assert_array_equal(
            d.u, ru[:H // 2, :W // 2].astype(np.uint8),
            err_msg=f"frame {i} U")
        np.testing.assert_array_equal(
            d.v, rv[:H // 2, :W // 2].astype(np.uint8),
            err_msg=f"frame {i} V")
    return dec


@pytest.mark.parametrize("cabac,parts", [(False, False), (False, True),
                                         (True, False), (True, True)])
def test_intra_in_b_novel_content(cabac, parts):
    dec = _roundtrip(_novel_b_frames(seed=1), cabac=cabac,
                     partitions=parts)
    kinds = [m.mb_type for m in dec[1].mbs]
    n_intra = sum(1 for k in kinds if k.startswith("I"))
    assert n_intra > 0, f"no intra MBs in B: {set(kinds)}"


@pytest.mark.parametrize("cabac", [False, True])
def test_intra_in_b_mixed_with_inter(cabac):
    dec = _roundtrip(_novel_b_frames(seed=2, mixed=True), cabac=cabac,
                     partitions=True)
    kinds = [m.mb_type for m in dec[1].mbs]
    n_intra = sum(1 for k in kinds if k.startswith("I"))
    n_inter = len(kinds) - n_intra
    assert n_intra > 0, f"no intra MBs in mixed B: {set(kinds)}"
    assert n_inter > 0, f"no inter MBs in mixed B: {set(kinds)}"


def test_intra_in_b_off_when_disabled():
    dec = _roundtrip(_novel_b_frames(seed=3), intra_in_p=False)
    kinds = [m.mb_type for m in dec[1].mbs]
    assert not any(k.startswith("I") for k in kinds)
