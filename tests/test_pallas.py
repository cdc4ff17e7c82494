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
