"""b-adapt 2: B-placement trellis over the lookahead window
(x264_slicetype_analyse B_ADAPT_TRELLIS, slicetype.c:476). The DP must
place the anchor ON a discontinuity (a frame that predicts badly from
both sides makes a terrible B), and the full pipe must stay
conformant + decodable with the stego payload intact."""

import numpy as np
import pytest

from video_steganography_pcamv_tpu.params import Params, StegoParams
from video_steganography_pcamv_tpu.utils.yuv import Frame
from video_steganography_pcamv_tpu.encoder.core import Encoder
from video_steganography_pcamv_tpu.encoder.slicetype import slicetype_path
from video_steganography_pcamv_tpu.decoder import decode_annexb

W, H = 96, 64


def _pan(n, jump_at=None, seed=0):
    rng = np.random.RandomState(seed)
    big = rng.randint(30, 226, ((H + 120) // 4, (W + 120) // 4))
    big = np.repeat(np.repeat(big, 4, 0), 4, 1).astype(np.uint8)
    frames = []
    for i in range(n):
        if jump_at is not None and i >= jump_at:
            f = big[60 + 2 * i:60 + 2 * i + H, 40 + i:40 + i + W].copy()
        else:
            f = big[8 + i:8 + i + H, 8 + 2 * i:8 + 2 * i + W].copy()
        u = np.full((H // 2, W // 2), 128, np.uint8)
        frames.append(Frame(f, u, u.copy()))
    return frames


def test_slicetype_path_prefers_anchor_on_discontinuity():
    # window of 3; frame 1 is a scene jump: B(1|0-ref,2) is expensive,
    # P(1|prev) moderate -> the DP should anchor at 1 first, not ride
    # it as a B
    C = {("P", 0, -1, -2): 100.0, ("P", 1, -1, -2): 10_000.0,
         ("P", 1, 0, -2): 9_000.0, ("P", 2, -1, -2): 12_000.0,
         ("P", 2, 0, -2): 9_500.0, ("P", 2, 1, -2): 100.0,
         ("B", 0, -1, 1): 50.0, ("B", 0, -1, 2): 60.0,
         ("B", 1, -1, 2): 50_000.0, ("B", 1, 0, 2): 50_000.0}
    assert slicetype_path(C, 3, 2) in (0, 1)
    # smooth window: all-B path wins -> first anchor is the last frame
    C2 = {("P", 0, -1, -2): 100.0, ("P", 1, -1, -2): 110.0,
          ("P", 1, 0, -2): 100.0, ("P", 2, -1, -2): 120.0,
          ("P", 2, 0, -2): 110.0, ("P", 2, 1, -2): 100.0,
          ("B", 0, -1, 1): 10.0, ("B", 0, -1, 2): 12.0,
          ("B", 1, -1, 2): 10.0, ("B", 1, 0, 2): 11.0}
    assert slicetype_path(C2, 3, 2) == 2


@pytest.mark.slow
def test_badapt2_e2e_roundtrip():
    frames = _pan(7, jump_at=4)
    p = Params(width=W, height=H, qp=27, me_range=8, partitions=True,
               bframes=2, b_adapt=2, rc_lookahead=3,
               stego=StegoParams(em_rate=6.0, key=5))
    enc = Encoder(p)
    enc.keep_recon = True
    bs = b""
    for f in frames:
        bs += enc.encode_frame(f)
    bs += enc.flush()
    dec = decode_annexb(bs)
    assert len(dec) == len(frames)
    # conformance: decoder recon == encoder recon, display order
    order = sorted(enc.recon_by_disp)
    assert order == list(range(len(frames)))
    for i, d in enumerate(dec):
        np.testing.assert_array_equal(
            d.y, enc.recon_by_disp[i][0][:H, :W].astype(np.uint8),
            err_msg=f"frame {i}")
    kinds = [d.slice_type for d in dec]
    assert 1 in kinds, \
        f"trellis produced no B slices on pan content: {kinds}"
