"""Incremental P re-encode == full re-encode (oracle equivalence).

The stego pass-2 re-encode only touches MBs whose final MV or skip
flag changed; everything else keeps the pass-1 result. This must be
bit-identical to the full-frame re-encode with force_zero
(encoder/inter_incr.py exactness argument)."""

import numpy as np
import jax.numpy as jnp
import pytest

from video_steganography_pcamv_tpu.ops import mc
from video_steganography_pcamv_tpu.encoder import inter as P
from video_steganography_pcamv_tpu.encoder.inter_incr import (
    reencode_p_incremental, changed_mbs)


@pytest.mark.parametrize("seed", [0, 3])
def test_incremental_matches_full(seed):
    rng = np.random.default_rng(seed)
    mbh, mbw = 4, 6
    H, W = 16 * mbh, 16 * mbw
    prev = rng.integers(0, 256, (H, W)).astype(np.int32)
    # mildly correlated current frame so some MBs skip / have low cbp
    cur = np.clip(prev + rng.integers(-6, 7, (H, W)), 0, 255)
    u0 = rng.integers(0, 256, (H // 2, W // 2)).astype(np.int32)
    v0 = rng.integers(0, 256, (H // 2, W // 2)).astype(np.int32)
    un = np.clip(u0 + rng.integers(-4, 5, u0.shape), 0, 255)
    vn = np.clip(v0 + rng.integers(-4, 5, v0.shape), 0, 255)

    ref = mc.build_ref(jnp.asarray(prev, jnp.uint8),
                       jnp.asarray(u0, jnp.uint8),
                       jnp.asarray(v0, jnp.uint8))
    y = jnp.asarray(cur)
    u = jnp.asarray(un)
    v = jnp.asarray(vn)
    qp, qpc = 26, 26

    # pass-1 MV field + full pass-1 encode (no force_zero)
    mv8_1 = rng.integers(-12, 13, (2 * mbh, 2 * mbw, 2)).astype(np.int32)
    res1 = P.encode_p_frame_device8(
        y, u, v, ref["luma"], ref["u"], ref["v"], jnp.asarray(mv8_1),
        qp, qpc, mbh, mbw)

    # final field: flip a few units; a couple of MBs become skip
    final8 = mv8_1.copy()
    changed_units = [(1, 2), (3, 5), (6, 10), (0, 0)]
    for (gy, gx) in changed_units:
        final8[gy, gx] += rng.integers(-2, 3, 2)
    skip1 = np.zeros((mbh, mbw), bool)
    # mark one unchanged MB as skip in BOTH pass-1 and final: pass-1
    # must then have been encoded with zero residual for equivalence —
    # emulate by zeroing it via the full encode's force_zero in both
    skip_final = skip1.copy()

    res_full = P.encode_p_frame_device8(
        y, u, v, ref["luma"], ref["u"], ref["v"], jnp.asarray(final8),
        qp, qpc, mbh, mbw, force_zero=jnp.asarray(skip_final))

    idx, fz = changed_mbs(mv8_1, final8, skip1, skip_final, mbh, mbw)
    assert len(idx) >= 3
    from video_steganography_pcamv_tpu.encoder.inter_incr import pad_subset
    idx_p, fz_p, cap = pad_subset(idx, fz, mbh * mbw)

    res_incr = reencode_p_incremental(
        res1, y, u, v, ref["luma"], ref["u"], ref["v"],
        jnp.asarray(final8), jnp.asarray(idx_p), jnp.asarray(fz_p),
        qp, qpc, mbh, mbw, cap)

    for k in ("luma_lev", "chroma_dc", "chroma_ac", "cbp_luma",
              "cbp_chroma", "recon_y", "recon_u", "recon_v"):
        np.testing.assert_array_equal(
            np.asarray(res_incr[k]), np.asarray(res_full[k]), err_msg=k)


def test_changed_set_catches_skip_ripple():
    """A skip MB whose P_SKIP MV changed (neighbour flip ripple) must
    enter the changed set through the final8-vs-pass1 comparison."""
    mbh, mbw = 2, 2
    mv1 = np.zeros((4, 4, 2), np.int32)
    fin = mv1.copy()
    fin[2, 2] = (4, 0)   # skip MB's pskip mv moved
    skip = np.zeros((2, 2), bool)
    skip[1, 1] = True
    idx, fz = changed_mbs(mv1, fin, skip, skip, mbh, mbw)
    assert 3 in idx.tolist()
    assert fz[idx.tolist().index(3)]
