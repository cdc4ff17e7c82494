"""Pallas kernels vs jnp twins (checkasm model), interpret mode on CPU."""

import numpy as np
import jax.numpy as jnp

from video_steganography_pcamv_tpu.ops import mc
from video_steganography_pcamv_tpu.ops.pallas_kernels import (
    fullpel_search_pallas)
from video_steganography_pcamv_tpu.encoder.me import fullpel_search


def test_fullpel_pallas_matches_jnp():
    rng_np = np.random.RandomState(5)
    mbh, mbw, rng = 3, 8, 4
    h, w = 16 * mbh, 16 * mbw
    ref = rng_np.randint(0, 256, (h, w)).astype(np.int32)
    # build cur as a shifted ref + noise so there are real best MVs
    cur = np.roll(np.roll(ref, 2, 0), -3, 1)
    cur = np.clip(cur + rng_np.randint(-2, 3, cur.shape), 0, 255)
    ref_p = mc.pad_plane(jnp.asarray(ref))
    lam = 4

    mv_p, cost_p = fullpel_search_pallas(
        jnp.asarray(cur), ref_p, rng, mbh, mbw, lam, interpret=True)
    # jnp twin with zero predictor
    pred = jnp.zeros((mbh, mbw, 2), jnp.int32)
    mv_j, cost_j = fullpel_search(jnp.asarray(cur), ref_p, pred,
                                  rng, mbh, mbw, lam)
    np.testing.assert_array_equal(np.asarray(mv_p), np.asarray(mv_j))
    np.testing.assert_array_equal(np.asarray(cost_p), np.asarray(cost_j))


def test_windows_mm_matches_gather():
    """One-hot MXU window fetch (round 5) vs the XLA gather twin:
    bit-exact for bounded MVs (the Pallas zero-predictor contract)."""
    from video_steganography_pcamv_tpu.encoder import partition as PT
    rng_ = np.random.RandomState(3)
    mbh, mbw, rng = 5, 7, 12
    Hp, Wp = 16 * mbh + 48, 16 * mbw + 48
    planes = jnp.asarray(rng_.randint(0, 255, (4, Hp, Wp)), jnp.uint8)
    mv = jnp.asarray(rng_.randint(-rng, rng + 1, (2 * mbh, 2 * mbw, 2)),
                     jnp.int32)
    a = np.asarray(PT.gather_windows8_jnp(planes, mv, mbh, mbw))
    b = np.asarray(PT.gather_windows8_mm(planes, mv, mbh, mbw, rng))
    np.testing.assert_array_equal(a, b)


def test_mc_mm_matches_gather():
    """mc_luma_mm / mc_chroma_mm (one-hot MXU MC, round 5) vs the
    gather-based originals across the full bounded qpel MV range."""
    from video_steganography_pcamv_tpu.ops import mc
    r = np.random.RandomState(11)
    for seed in range(3):
        mbh, mbw, rng = 3 + seed, 5, (4, 8, 16)[seed]
        n8 = 4 * mbh * mbw
        Hp, Wp = 16 * mbh + 48, 16 * mbw + 48
        planes = jnp.asarray(r.randint(0, 255, (4, Hp, Wp)), jnp.int32)
        mv = jnp.asarray(r.randint(-(4 * rng + 5), 4 * rng + 6,
                                   (n8, 2)), jnp.int32)
        ys8 = (jnp.arange(n8) // (2 * mbw)) * 8
        xs8 = (jnp.arange(n8) % (2 * mbw)) * 8
        a = np.asarray(mc.mc_luma(planes, ys8, xs8, mv, bh=8, bw=8))
        b = np.asarray(mc.mc_luma_mm(planes, mbh, mbw, mv, rng + 2))
        np.testing.assert_array_equal(a, b, err_msg=f"luma rng{rng}")
        cp = jnp.asarray(r.randint(0, 255, (8 * mbh + 48, 8 * mbw + 48)),
                         jnp.int32)
        ysc = (jnp.arange(n8) // (2 * mbw)) * 4
        xsc = (jnp.arange(n8) % (2 * mbw)) * 4
        ca = np.asarray(mc.mc_chroma(cp, ysc, xsc, mv, bh=4, bw=4))
        cb = np.asarray(mc.mc_chroma_mm(cp, mbh, mbw, mv,
                                        (rng + 2) // 2 + 2))
        np.testing.assert_array_equal(ca, cb, err_msg=f"chroma rng{rng}")
