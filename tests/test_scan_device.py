"""Device scan oracle test: scan_device.scan_p_device must match the
serial host scan (encoder/scan.py, itself the C++ twin's oracle)
exactly on randomized partition/MV/cbp/intra/ref fields."""

import numpy as np

from video_steganography_pcamv_tpu.encoder import scan as SCAN
from video_steganography_pcamv_tpu.encoder.scan_device import scan_p_device

rng = np.random.RandomState(3)


def _rand_fields(mbh, mbw, with_intra, with_ref, nref=2, small_mv=False):
    part = rng.randint(0, 4, (mbh, mbw)).astype(np.int32)
    span = 2 if small_mv else 20
    mv8 = rng.randint(-span, span + 1,
                      (2 * mbh, 2 * mbw, 2)).astype(np.int32)
    # units are uniform: repeat per-8x8 values to match unit granularity
    # (the analyser guarantees this; make 16x16/16x8/8x16 consistent)
    for my in range(mbh):
        for mx in range(mbw):
            p = int(part[my, mx])
            g = mv8[2 * my:2 * my + 2, 2 * mx:2 * mx + 2]
            if p == 0:
                g[:, :] = g[0, 0]
            elif p == 1:
                g[0, :] = g[0, 0]
                g[1, :] = g[1, 0]
            elif p == 2:
                g[:, 0] = g[0, 0]
                g[:, 1] = g[0, 1]
    cbp_l = rng.randint(0, 2, (mbh, mbw)).astype(np.int32) * \
        rng.randint(0, 16, (mbh, mbw)).astype(np.int32)
    cbp_c = rng.randint(0, 3, (mbh, mbw)).astype(np.int32)
    intra = (rng.rand(mbh, mbw) < 0.2) if with_intra else None
    ref8 = None
    if with_ref:
        ref8 = rng.randint(0, nref, (2 * mbh, 2 * mbw)).astype(np.int32)
        for my in range(mbh):
            for mx in range(mbw):
                p = int(part[my, mx])
                g = ref8[2 * my:2 * my + 2, 2 * mx:2 * mx + 2]
                if p == 0:
                    g[:, :] = g[0, 0]
                elif p == 1:
                    g[0, :] = g[0, 0]
                    g[1, :] = g[1, 0]
                elif p == 2:
                    g[:, 0] = g[0, 0]
                    g[:, 1] = g[0, 1]
    return part, mv8, cbp_l, cbp_c, intra, ref8


def _compare(mbh, mbw, with_intra, with_ref, small_mv=False):
    part, mv8, cbp_l, cbp_c, intra, ref8 = _rand_fields(
        mbh, mbw, with_intra, with_ref, small_mv=small_mv)
    skip_h, mvd_h, mvp_h, fin_h = SCAN.scan_p_frame(
        part, mv8, cbp_l, cbp_c, intra=intra, ref8=ref8)
    skip_d, mvd_d, mvp_d, fin_d = scan_p_device(
        part, mv8, cbp_l, cbp_c, mbh, mbw,
        intra=intra, ref8=ref8)
    if intra is not None:
        # host leaves intra rows untouched (zeros); device zeroes too,
        # but host skips the mvd compute for intra MBs — mask them
        m = ~intra
        np.testing.assert_array_equal(np.asarray(skip_d)[m], skip_h[m])
        np.testing.assert_array_equal(np.asarray(mvd_d)[m], mvd_h[m])
        np.testing.assert_array_equal(np.asarray(mvp_d)[m], mvp_h[m])
    else:
        np.testing.assert_array_equal(np.asarray(skip_d), skip_h)
        np.testing.assert_array_equal(np.asarray(mvd_d), mvd_h)
        np.testing.assert_array_equal(np.asarray(mvp_d), mvp_h)
    np.testing.assert_array_equal(np.asarray(fin_d), fin_h)


def test_scan_device_basic():
    for trial in range(4):
        _compare(5, 7, with_intra=False, with_ref=False)


def test_scan_device_small_mv_skip_paths():
    # small MVs force MV collisions: pskip zero rules + skip flags hit
    for trial in range(4):
        _compare(6, 6, with_intra=False, with_ref=False, small_mv=True)


def test_scan_device_intra_holes():
    for trial in range(3):
        _compare(5, 9, with_intra=True, with_ref=False)


def test_scan_device_multiref():
    for trial in range(3):
        _compare(6, 8, with_intra=False, with_ref=True)


def test_scan_device_multiref_intra():
    for trial in range(3):
        _compare(4, 11, with_intra=True, with_ref=True, small_mv=True)
