"""Frame-tile mesh axis (parallel/tile.py): MB-row sharding of one
frame's fused stage-1 with reference-plane halo exchange.

Correctness gate: on a virtual 4-device CPU mesh, the tiled step must
be BIT-EXACT vs the single-chip pipeline step whenever the vertical
predictor respects the halo clamp (zero predictor here — the first-P
shape). Collective audit: the compiled HLO contains collective-permute
ops for the halo exchange and NO all-gather / all-reduce on the hot
path (the reference planes are never globally replicated)."""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from video_steganography_pcamv_tpu.ops import mc
from video_steganography_pcamv_tpu.models import pipeline
from video_steganography_pcamv_tpu.parallel import tile as TL
from video_steganography_pcamv_tpu.utils.yuv import synthetic_sequence

N_TILES = 4


def _mesh():
    devs = jax.devices()
    if len(devs) < N_TILES:
        pytest.skip(f"needs {N_TILES} virtual devices "
                    "(XLA_FLAGS=--xla_force_host_platform_device_count)")
    return Mesh(np.array(devs[:N_TILES]), ("tile",))


def _inputs(mbh, mbw, seed=3):
    h, w = 16 * mbh, 16 * mbw
    frames = synthetic_sequence(w, h, 2, seed=seed)
    f0, f1 = frames
    return (f1.y.astype(np.int32), f1.u.astype(np.int32),
            f1.v.astype(np.int32), f0.y.astype(np.int32),
            f0.u.astype(np.int32), f0.v.astype(np.int32))


def test_tiled_step_matches_single_chip():
    mesh = _mesh()
    mbh, mbw = 12, 6          # 3 MB rows per tile (>= one halo tall)
    y, u, v, ry, ru, rv = _inputs(mbh, mbw)
    prev_mv = np.zeros((mbh, mbw, 2), np.int32)

    out_t = TL.p_frame_step_tiled(mesh, y, u, v, ry, ru, rv, prev_mv,
                                  qp=28, qpc=28, mbh=mbh, mbw=mbw,
                                  rng=8, lam=4)

    ref = mc.build_ref(jnp.asarray(ry), jnp.asarray(ru),
                       jnp.asarray(rv))
    out_s = pipeline.p_frame_step_parts(
        jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
        ref["luma"], ref["u"], ref["v"],
        jnp.asarray(prev_mv), qp=28, qpc=28, mbh=mbh, mbw=mbw,
        rng=8, lam=4)

    for k in sorted(out_s):
        a = np.asarray(out_s[k])
        b = np.asarray(out_t[k])
        assert a.shape == b.shape, f"{k}: {a.shape} vs {b.shape}"
        if a.dtype.kind == "f":
            np.testing.assert_allclose(a, b, rtol=1e-6, err_msg=k)
        else:
            np.testing.assert_array_equal(a, b, err_msg=k)


def test_tiled_step_collective_audit():
    mesh = _mesh()
    hlo = TL.lower_tiled_hlo(mesh, mbh=12, mbw=6, rng=8)
    n_perm = len(re.findall(r"collective-permute", hlo))
    n_ag = len(re.findall(r"all-gather", hlo))
    n_ar = len(re.findall(r"all-reduce", hlo))
    # the two halo ppermutes may appear fused/duplicated (start/done
    # pairs) but must be present; nothing may globally replicate the
    # reference planes
    assert n_perm >= 2, f"halo permutes missing (found {n_perm})"
    assert n_ag == 0, f"unexpected all-gather x{n_ag} (replicated ref?)"
    assert n_ar == 0, f"unexpected all-reduce x{n_ar}"


def test_pred_clamp_documented_bound():
    # the clamp must keep pred+rng+window margin inside the PAD halo
    for rng in (4, 8, 16):
        c = TL.pred_clamp_fp(rng)
        assert c + rng + 7 <= mc.PAD or c == 0
