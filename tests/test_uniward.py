"""S-UNIWARD MV-field complexity cost properties."""

import numpy as np
import jax.numpy as jnp

from video_steganography_pcamv_tpu.ops import uniward as U


def test_wavelet_filter_identities():
    # QMF pair: low-pass sums to sqrt(2), high-pass to 0; both unit norm
    assert abs(U._LPDF.sum() - np.sqrt(2)) < 1e-6
    assert abs(U._HPDF.sum()) < 1e-6
    assert abs((U._HPDF ** 2).sum() - 1.0) < 1e-6
    assert abs((U._LPDF ** 2).sum() - 1.0) < 1e-6


def test_smooth_field_costs_more_than_textured():
    """UNIWARD: embedding in flat/smooth regions is expensive, in
    textured regions cheap."""
    rng = np.random.RandomState(0)
    flat = jnp.zeros((40, 48), jnp.float32)
    noisy = jnp.asarray(rng.randint(-8, 9, (40, 48)).astype(np.float32))
    c_flat = np.asarray(U.uniward_cost(flat))
    c_noisy = np.asarray(U.uniward_cost(noisy))
    assert c_flat.mean() > 3 * c_noisy.mean()


def test_cost_is_positive_and_finite():
    rng = np.random.RandomState(1)
    f = jnp.asarray(rng.randint(-30, 31, (36, 44)).astype(np.float32))
    c = np.asarray(U.mv_field_cost(f, -f))
    assert np.all(np.isfinite(c)) and np.all(c > 0)
    assert c.shape == (36, 44)


def test_alpha_com_changes_embedding():
    from video_steganography_pcamv_tpu.params import Params, StegoParams
    from video_steganography_pcamv_tpu.utils.yuv import synthetic_sequence
    from video_steganography_pcamv_tpu.encoder.core import Encoder
    from video_steganography_pcamv_tpu.stego.extract import (
        extract_from_stream)

    frames = synthetic_sequence(64, 48, 3, seed=8)
    p = Params(width=64, height=48, qp=26, me_range=8,
               stego=StegoParams(em_rate=8.0, key=3, alpha_com=0.2))
    enc = Encoder(p)
    bs = b"".join(enc.encode_frame(f) for f in frames)
    got = extract_from_stream(bs, em_rate=8.0, key=3)
    for g, s in zip(got, enc._stego.sent_messages):
        np.testing.assert_array_equal(g, s)
