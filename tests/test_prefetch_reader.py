"""Threaded input read-ahead (the reference's muxers.c:441-517
open_file_thread analog): identical frames, identical bitstreams."""

import numpy as np

from video_steganography_pcamv_tpu.utils import yuv


def _clip(tmp_path, n=7, w=48, h=32):
    frames = yuv.synthetic_sequence(w, h, n, seed=9)
    path = str(tmp_path / "in.y4m")
    yuv.write_y4m(path, frames, fps=(25, 1))
    return path, frames


def test_prefetch_matches_direct(tmp_path):
    path, frames = _clip(tmp_path)
    direct = yuv.open_input(path)
    pre = yuv.PrefetchReader(yuv.open_input(path))
    for i in range(direct.num_frames):
        a, b = direct.read(i), pre.read(i)
        np.testing.assert_array_equal(a.y, b.y)
        np.testing.assert_array_equal(a.u, b.u)
        np.testing.assert_array_equal(a.v, b.v)
    pre.close()
    direct.close()


def test_prefetch_with_seek_and_random_access(tmp_path):
    path, frames = _clip(tmp_path)
    pre = yuv.PrefetchReader(yuv.open_input(path), start=3)
    got = pre.read(3)
    np.testing.assert_array_equal(got.y, frames[3].y)
    # non-sequential index bypasses the queue
    got0 = pre.read(0)
    np.testing.assert_array_equal(got0.y, frames[0].y)
    got4 = pre.read(4)
    np.testing.assert_array_equal(got4.y, frames[4].y)
    pre.close()
