"""B direct MV prediction modes (--direct none/spatial/temporal/auto).

Temporal direct: spec 8.4.1.2.3 / reference
x264_mb_predict_mv_direct16x16_temporal (common/macroblock.c:165) —
colocated corner MVs scaled by DistScaleFactor, colocated intra ->
zeros with refs 0, colocated ref > 0 -> MB direct-unavailable (single
L0 entry). Slice header signals direct_spatial_mv_pred_flag.
"""

import numpy as np
import pytest

from video_steganography_pcamv_tpu.params import Params
from video_steganography_pcamv_tpu.utils.yuv import Frame
from video_steganography_pcamv_tpu.encoder.core import Encoder
from video_steganography_pcamv_tpu.encoder import bslice as BS
from video_steganography_pcamv_tpu.decoder import decode_annexb

W, H = 128, 96


def _pan_frames(n, seed=2, step=2):
    rng = np.random.RandomState(seed)
    pad = 48
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


def test_dist_scale_factor_midpoint():
    # B exactly between anchors: tb/td = 1/2 -> DSF 128, mv0 = mv/2
    assert BS.dist_scale_factor(2, 0, 4) == 128
    assert BS.dist_scale_factor(0, 0, 4) == 0


def test_temporal_fields_scaling_and_avail():
    col_mv4 = np.zeros((8, 8, 2), np.int32)
    col_ref4 = np.zeros((8, 8), np.int32)
    col_mv4[:4, :4] = (12, -6)          # MB (0,0): mv (12,-6), ref 0
    col_ref4[:4, 4:] = 1                # MB (0,1): ref 1 -> unavailable
    col_ref4[4:, :4] = -1               # MB (1,0): intra -> zeros
    avail, mv0, mv1, _r8 = BS.temporal_direct_fields(col_mv4, col_ref4, 128)
    assert avail.tolist() == [[True, False], [True, True]]
    # mv0 = (128*mv + 128) >> 8 = (mv + 1) >> 1 (round toward -inf)
    np.testing.assert_array_equal(mv0[0, 0], [6, -3])
    np.testing.assert_array_equal(mv1[0, 0], [6 - 12, -3 + 6])
    np.testing.assert_array_equal(mv0[2, 0], [0, 0])   # intra col
    np.testing.assert_array_equal(mv1[2, 0], [0, 0])


@pytest.mark.parametrize("direct,cabac", [(2, False), (2, True),
                                          (3, False), (0, False)])
def test_direct_modes_roundtrip(direct, cabac):
    frames = _pan_frames(6)
    p = Params(width=W, height=H, qp=26, me_range=8, bframes=1,
               b_adapt=0, direct=direct, cabac=cabac)
    enc = Encoder(p)
    enc.keep_recon = True
    bs = b"".join(enc.encode_frame(f) for f in frames) + enc.flush()
    dec = decode_annexb(bs)
    assert len(dec) == 6
    assert any(d.slice_type in (1, 6) for d in dec)
    if direct == 0:
        for d in dec:
            if d.slice_type in (1, 6):
                kinds = {m.mb_type for m in d.mbs}
                assert "BSKIP" not in kinds and "BDIRECT" not in kinds, \
                    kinds
    for i, d in enumerate(dec):
        ry = enc.recon_by_disp[i][0][:H, :W].astype(np.uint8)
        np.testing.assert_array_equal(d.y, ry, err_msg=f"frame {i}")


def test_temporal_direct_used_on_pan():
    """Smooth panning: temporal-direct MVs track the anchor motion, so
    direct/skip MBs must actually appear."""
    frames = _pan_frames(6)
    p = Params(width=W, height=H, qp=30, me_range=8, bframes=1,
               b_adapt=0, direct=2)
    enc = Encoder(p)
    bs = b"".join(enc.encode_frame(f) for f in frames) + enc.flush()
    dec = decode_annexb(bs)
    kinds = [m.mb_type for d in dec if d.slice_type in (1, 6)
             for m in d.mbs]
    n_dir = sum(1 for k in kinds if "SKIP" in k or "DIRECT" in k)
    assert n_dir > 0, set(kinds)
