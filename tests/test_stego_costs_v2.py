"""Bit-exactness fuzz: the per-block shared-encode RCA probe stage
(partition.stego_costs_parts) vs its full-MB re-encode reference twin
(stego_costs_parts_ref).

The rewrite dedupes the probe DCT volume: 13 block-level encode passes
instead of 49 MB-level ones (each (slot, candidate) MB is assembled
from per-block versions v in {0 (chosen MV), 1..12 (D_MV)}), with the
JVT-B118 decimation coupling reproduced by cheap per-combination
selects. Reference semantics: analyse.c:2391-2550 MV_SATD_FDEC_IH with
a full x264_macroblock_encode per probe."""

import numpy as np
import jax.numpy as jnp
import pytest

from video_steganography_pcamv_tpu.ops import mc
from video_steganography_pcamv_tpu.utils.yuv import synthetic_sequence
from video_steganography_pcamv_tpu.encoder import partition as PT
from video_steganography_pcamv_tpu.stego.cost import cost_mv_table


def _setup(W, H, seed, allow_parts=True):
    mbh, mbw = H // 16, W // 16
    fr = synthetic_sequence(W, H, 2, seed=seed)
    y = jnp.asarray(fr[1].y, jnp.int32)
    ref = mc.build_ref(jnp.asarray(fr[0].y, jnp.int32),
                       jnp.asarray(fr[0].u, jnp.int32),
                       jnp.asarray(fr[0].v, jnp.int32))
    prev = jnp.zeros((mbh, mbw, 2), jnp.int32)
    part, mv8, r8, blocks8, wht8, _cost = PT.analyse_p_frame_parts(
        y, ref["luma"], prev, 8, mbh, mbw, 4, 2, allow_parts=allow_parts)
    return y, part, mv8, r8, blocks8, wht8, mbh, mbw


@pytest.mark.parametrize("seed,qp,decimate", [
    (3, 26, True),
    (11, 22, True),
    (7, 38, True),
    (3, 26, False),
    (5, 51, True),
    (9, 12, True),
])
def test_v2_matches_ref_twin(seed, qp, decimate):
    y, part, mv8, r8, blocks8, wht8, mbh, mbw = _setup(160, 96, seed)
    cmv = jnp.asarray(cost_mv_table(4))
    rng = np.random.default_rng(seed)
    mvp_u = jnp.asarray(rng.integers(-12, 13, (mbh, mbw, 4, 2)),
                        jnp.int32)

    ref_out = PT.stego_costs_parts_ref(
        y, blocks8, wht8, r8, part, mv8, mvp_u, cmv, qp, mbh, mbw,
        decimate)
    new_out = PT.stego_costs_parts(
        y, blocks8, wht8, r8, part, mv8, mvp_u, cmv, qp, mbh, mbw,
        decimate)

    for name, a, b in zip(("rho", "alt", "valid"), ref_out, new_out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_v2_matches_ref_twin_per_mb_qp():
    """Adaptive quantization path: qp is a per-MB [n] vector."""
    y, part, mv8, r8, blocks8, wht8, mbh, mbw = _setup(128, 96, seed=21)
    cmv = jnp.asarray(cost_mv_table(4))
    rng = np.random.default_rng(21)
    mvp_u = jnp.asarray(rng.integers(-8, 9, (mbh, mbw, 4, 2)), jnp.int32)
    qp = jnp.asarray(rng.integers(18, 42, (mbh * mbw,)), jnp.int32)

    ref_out = PT.stego_costs_parts_ref(
        y, blocks8, wht8, r8, part, mv8, mvp_u, cmv, qp, mbh, mbw, True)
    new_out = PT.stego_costs_parts(
        y, blocks8, wht8, r8, part, mv8, mvp_u, cmv, qp, mbh, mbw, True)

    for name, a, b in zip(("rho", "alt", "valid"), ref_out, new_out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_v2_matches_ref_twin_16x16_only():
    """allow_parts=False: every MB is D_16x16 (single unit)."""
    y, part, mv8, r8, blocks8, wht8, mbh, mbw = _setup(
        128, 96, seed=4, allow_parts=False)
    cmv = jnp.asarray(cost_mv_table(4))
    mvp_u = jnp.zeros((mbh, mbw, 4, 2), jnp.int32)

    ref_out = PT.stego_costs_parts_ref(
        y, blocks8, wht8, r8, part, mv8, mvp_u, cmv, 30, mbh, mbw, True)
    new_out = PT.stego_costs_parts(
        y, blocks8, wht8, r8, part, mv8, mvp_u, cmv, 30, mbh, mbw, True)

    for name, a, b in zip(("rho", "alt", "valid"), ref_out, new_out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
