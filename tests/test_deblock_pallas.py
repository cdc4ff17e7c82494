"""Fused Pallas deblock kernel vs the XLA knight-wavefront twin.

The XLA twin (ops/deblock_jax.py) is itself bit-exact against the C++
host filter (tests/test_deblock_device.py), so equality here chains to
the normative reference. Structured low-amplitude content plus real
nnz/mv/intra/skip maps exercise every edge type: strong (intra),
normal bs 1/2, MB-boundary qPav, per-MB AQ maps, multi-ref bS, and the
qp_thresh internal-edge kill.

The kernel runs in interpreter mode on CPU (Mosaic only targets TPU);
tests/perf on silicon use the compiled path via tools/benchkernels.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from video_steganography_pcamv_tpu.ops import deblock_jax as DJ
from video_steganography_pcamv_tpu.ops import deblock_pallas as DP

DP.INTERPRET = True


def _mk_frame(rng, mbh, mbw, amp=24, qp=32):
    H, W = 16 * mbh, 16 * mbw
    base = rng.integers(60, 180, (mbh, mbw))
    y = np.repeat(np.repeat(base, 16, 0), 16, 1)
    y = np.clip(y + rng.integers(-amp, amp + 1, (H, W)), 0, 255)
    u = np.clip(128 + rng.integers(-amp, amp + 1, (H // 2, W // 2)), 0, 255)
    v = np.clip(128 + rng.integers(-amp, amp + 1, (H // 2, W // 2)), 0, 255)
    intra = (rng.random((mbh, mbw)) < 0.15).astype(np.int32)
    skip = ((rng.random((mbh, mbw)) < 0.2) & (intra == 0)).astype(np.int32)
    nnz4 = (rng.random((4 * mbh, 4 * mbw)) < 0.5).astype(np.int32)
    mv4 = rng.integers(-20, 21, (4 * mbh, 4 * mbw, 2)).astype(np.int32)
    # make MVs piecewise-constant over 8x8 units like a real field
    mv4 = np.repeat(np.repeat(mv4[::2, ::2], 2, 0), 2, 1)
    return (jnp.asarray(y.astype(np.int32)),
            jnp.asarray(u.astype(np.int32)),
            jnp.asarray(v.astype(np.int32)),
            jnp.asarray(intra), jnp.asarray(skip),
            jnp.asarray(nnz4), jnp.asarray(mv4))


@pytest.mark.parametrize("qp,mbh,mbw", [(32, 6, 8), (40, 5, 9), (20, 4, 12)])
def test_pallas_matches_wavefront(qp, mbh, mbw):
    rng = np.random.default_rng(qp)
    y, u, v, intra, skip, nnz4, mv4 = _mk_frame(rng, mbh, mbw, qp=qp)
    qpc = min(qp, 39)
    ref = DJ.deblock_frame_device(y, u, v, intra, skip, nnz4, mv4,
                                  qp, qpc, mbh, mbw)
    got = DP.deblock_frame_pallas(y, u, v, intra, skip, nnz4, mv4,
                                  qp, qpc, mbh, mbw)
    for a, b, name in zip(ref, got, "yuv"):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"plane {name}")


def test_pallas_aq_maps_and_mref():
    rng = np.random.default_rng(7)
    mbh, mbw = 5, 10
    y, u, v, intra, skip, nnz4, mv4 = _mk_frame(rng, mbh, mbw)
    qp_map = rng.integers(18, 44, (mbh, mbw)).astype(np.int32)
    qpc_map = np.minimum(qp_map, 39)
    ref4 = rng.integers(0, 3, (4 * mbh, 4 * mbw)).astype(np.int32)
    ref4 = np.repeat(np.repeat(ref4[::2, ::2], 2, 0), 2, 1)
    ref = DJ.deblock_frame_device(y, u, v, intra, skip, nnz4, mv4,
                                  jnp.asarray(qp_map),
                                  jnp.asarray(qpc_map), mbh, mbw,
                                  ref4=jnp.asarray(ref4), qp_thresh=13)
    got = DP.deblock_frame_pallas(y, u, v, intra, skip, nnz4, mv4,
                                  jnp.asarray(qp_map),
                                  jnp.asarray(qpc_map), mbh, mbw,
                                  ref4=jnp.asarray(ref4), qp_thresh=13)
    for a, b, name in zip(ref, got, "yuv"):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"plane {name}")


def test_pallas_trans8_and_offsets():
    """High-profile params (round 5): trans8 internal-edge rule +
    FilterOffsetA/B, Pallas (edge_params) vs the XLA twin, which
    test_deblock_device chains to the C++ oracle."""
    rng = np.random.default_rng(58)
    for qp, off_a, off_b in [(30, 6, -6), (24, -4, 4), (36, 12, 12)]:
        mbh, mbw = 5, 9
        y, u, v, intra, skip, nnz4, mv4 = _mk_frame(rng, mbh, mbw,
                                                    qp=qp)
        trans8 = jnp.asarray(
            (rng.random((mbh, mbw)) < 0.5).astype(np.int32))
        qpc = min(qp, 39)
        qpt = 15 - min(off_a, off_b)
        ref = DJ.deblock_frame_device(y, u, v, intra, skip, nnz4, mv4,
                                      qp, qpc, mbh, mbw,
                                      qp_thresh=qpt, trans8=trans8,
                                      off_a=off_a, off_b=off_b)
        got = DP.deblock_frame_pallas(y, u, v, intra, skip, nnz4, mv4,
                                      qp, qpc, mbh, mbw,
                                      qp_thresh=qpt, trans8=trans8,
                                      off_a=off_a, off_b=off_b)
        for a, b, name in zip(ref, got, "yuv"):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"plane {name} qp{qp} offA{off_a} offB{off_b}")
