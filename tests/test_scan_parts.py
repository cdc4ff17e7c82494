"""Native partition scan vs Python oracle: randomized equivalence
(checkasm pattern, SURVEY.md §4.1). Covers all partition shapes, skip
interactions, and the forced (stego pass-2) variant."""

import numpy as np
import pytest

from video_steganography_pcamv_tpu.encoder import scan as S
from video_steganography_pcamv_tpu import native


def _random_field(mbh, mbw, rng):
    part = rng.randint(0, 4, (mbh, mbw)).astype(np.int32)
    # unit-uniform mv8 field
    mv8 = np.zeros((2 * mbh, 2 * mbw, 2), np.int32)
    from video_steganography_pcamv_tpu.encoder.partition import UNIT_BLOCKS
    for my in range(mbh):
        for mx in range(mbw):
            p = int(part[my, mx])
            for blks in UNIT_BLOCKS[p]:
                mv = rng.randint(-12, 13, 2).astype(np.int32)
                for b in blks:
                    mv8[2 * my + (b >> 1), 2 * mx + (b & 1)] = mv
    return part, mv8


@pytest.mark.skipif(native.load() is None, reason="native lib missing")
def test_scan_parts_native_matches_python():
    rng = np.random.RandomState(0)
    for trial in range(8):
        mbh, mbw = rng.randint(2, 7), rng.randint(2, 9)
        part, mv8 = _random_field(mbh, mbw, rng)
        # random residual emptiness so pskip paths trigger
        cbp_l = (rng.rand(mbh, mbw) < 0.5).astype(np.int32)
        cbp_c = np.zeros((mbh, mbw), np.int32)
        # force some zero MVs for the pskip zero-neighbour rule
        zero = rng.rand(mbh, mbw) < 0.3
        for my, mx in zip(*np.nonzero(zero)):
            part[my, mx] = 0
            mv8[2 * my:2 * my + 2, 2 * mx:2 * mx + 2] = 0

        ref = S.scan_p_frame(part, mv8, cbp_l, cbp_c)
        got = native.scan_p_parts(part, mv8, cbp_l, cbp_c)
        for i, name in enumerate(("skip", "mvd", "mvp", "final8")):
            np.testing.assert_array_equal(
                got[i], ref[i], err_msg=f"trial {trial}: {name}")

        skip = ref[0]
        # forced variant with a few flipped MVs
        mv8b = mv8.copy()
        flips = rng.rand(2 * mbh, 2 * mbw) < 0.2
        mv8b[flips] += rng.randint(-1, 2, (int(flips.sum()), 2))
        ref_f = S.scan_p_frame_forced(part, mv8b, skip)
        got_f = native.scan_p_parts_forced(part, mv8b, skip)
        for i, name in enumerate(("final8", "mvd", "mvp")):
            np.testing.assert_array_equal(
                got_f[i], ref_f[i], err_msg=f"trial {trial} forced: {name}")
