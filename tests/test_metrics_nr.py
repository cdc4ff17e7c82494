"""SSIM metric, SEI version NAL, and dct noise reduction.

Reference: pixel.c:435-470 (ssim core), encoder.c:1069-1080/2605-2610
(in-loop driver + normalization), set.c:475 (SEI), quant.c:180 +
macroblock.c:902-922 (denoise_dct / nr update).
"""

import numpy as np

from video_steganography_pcamv_tpu.params import Params
from video_steganography_pcamv_tpu.utils.yuv import Frame
from video_steganography_pcamv_tpu.encoder.core import Encoder
from video_steganography_pcamv_tpu.decoder import decode_annexb

W, H = 96, 64


def _np_ssim(a, b):
    """Serial oracle of pixel.c ssim (sum over 8x8 windows, stride 4)."""
    h, w = a.shape
    bh, bw = h // 4, w // 4
    a = a[:4 * bh, :4 * bw].astype(np.int64)
    b = b[:4 * bh, :4 * bw].astype(np.int64)
    c1 = int(.01 * .01 * 255 * 255 * 64 + .5)
    c2 = int(.03 * .03 * 255 * 255 * 64 * 63 + .5)
    sums = np.zeros((bh, bw, 4), np.int64)
    for y in range(bh):
        for x in range(bw):
            pa = a[4 * y:4 * y + 4, 4 * x:4 * x + 4]
            pb = b[4 * y:4 * y + 4, 4 * x:4 * x + 4]
            sums[y, x] = (pa.sum(), pb.sum(),
                          (pa * pa).sum() + (pb * pb).sum(),
                          (pa * pb).sum())
    tot = 0.0
    for y in range(bh - 1):
        for x in range(bw - 1):
            s1, s2, ss, s12 = (sums[y, x] + sums[y, x + 1]
                               + sums[y + 1, x] + sums[y + 1, x + 1])
            vars_ = ss * 64 - s1 * s1 - s2 * s2
            covar = s12 * 64 - s1 * s2
            tot += (float(2 * s1 * s2 + c1) * float(2 * covar + c2)
                    / (float(s1 * s1 + s2 * s2 + c1)
                       * float(vars_ + c2)))
    return tot


def test_ssim_matches_oracle():
    import jax.numpy as jnp
    from video_steganography_pcamv_tpu.ops.pixel import ssim_wxh
    rng = np.random.RandomState(0)
    a = rng.randint(0, 256, (40, 56)).astype(np.int32)
    b = np.clip(a + rng.randint(-12, 13, a.shape), 0, 255)
    got = float(ssim_wxh(jnp.asarray(a), jnp.asarray(b)))
    exp = _np_ssim(a, b)
    assert abs(got - exp) < 1e-3 * max(1.0, abs(exp)), (got, exp)
    perfect = float(ssim_wxh(jnp.asarray(a), jnp.asarray(a)))
    nwin = (40 // 4 - 1) * (56 // 4 - 1)
    assert abs(perfect - nwin) < 1e-3


def _frames(n, seed=0, noise=0):
    rng = np.random.RandomState(seed)
    pad = 16
    a = rng.randint(20, 236, (H + 2 * pad, W + 2 * pad)).astype(np.uint8)
    for _ in range(2):
        a = ((a.astype(np.int32) + np.roll(a, 1, 0) + np.roll(a, 1, 1)
              + np.roll(np.roll(a, 1, 0), 1, 1)) // 4).astype(np.uint8)
    u = np.full((H // 2, W // 2), 128, np.uint8)
    out = []
    for i in range(n):
        yp = a[pad + i:pad + i + H, pad + 2 * i:pad + 2 * i + W] \
            .astype(np.int32)
        if noise:
            yp = yp + (rng.randn(H, W) * noise).astype(np.int32)
        out.append(Frame(np.clip(yp, 0, 255).astype(np.uint8),
                         u.copy(), u.copy()))
    return out


def test_sei_and_ssim_e2e():
    frames = _frames(3, seed=1)
    p = Params(width=W, height=H, qp=28, me_range=4, ssim=True)
    enc = Encoder(p)
    bs = b""
    for f in frames:
        bs += enc.encode_frame(f)
    # SEI NAL present (type 6) and the stream still decodes
    from video_steganography_pcamv_tpu.decoder.decoder import parse_nals
    types = [t for t, _, _ in parse_nals(bs)]
    assert 6 in types, types
    sei = next(r for t, _, r in parse_nals(bs) if t == 6)
    assert b"options:" in sei
    dec = decode_annexb(bs)
    assert len(dec) == 3
    stats = enc.close()
    assert 0.5 < stats["ssim_y"] <= 1.0, stats["ssim_y"]


def test_noise_reduction_rd():
    """--nr shrinks the stream on noisy content and stays decodable."""
    frames = _frames(5, seed=2, noise=8)
    sizes = {}
    for nr in (0, 1000):
        p = Params(width=W, height=H, qp=24, me_range=4,
                   noise_reduction=nr)
        enc = Encoder(p)
        bs = b""
        for f in frames:
            bs += enc.encode_frame(f)
        dec = decode_annexb(bs)
        ry = np.asarray(enc.recon_prev[0])[:H, :W].astype(np.uint8)
        np.testing.assert_array_equal(dec[-1].y, ry,
                                      err_msg=f"nr={nr}")
        sizes[nr] = len(bs)
    assert sizes[1000] < sizes[0], sizes


def test_lean_level_packer_exact():
    """int8+exceptions level transfer (serving path) must be exact,
    including out-of-int8-range coefficients."""
    import jax.numpy as jnp
    from video_steganography_pcamv_tpu.encoder import core as C
    rng2 = np.random.RandomState(0)
    n = 24
    res = {"luma_lev": jnp.asarray(
               rng2.randint(-300, 300, (n, 256)).astype(np.int16)),
           "chroma_dc": jnp.asarray(
               rng2.randint(-80, 80, (n, 8)).astype(np.int16)),
           "chroma_ac": jnp.asarray(
               rng2.randint(-10, 10, (n, 128)).astype(np.int16))}
    out = C._res_to_host(res, 4, 6, with_recon=False)
    np.testing.assert_array_equal(
        out["luma_lev"].reshape(-1),
        np.asarray(res["luma_lev"]).reshape(-1))
    np.testing.assert_array_equal(
        out["chroma_dc"].reshape(-1),
        np.asarray(res["chroma_dc"]).reshape(-1))
    np.testing.assert_array_equal(
        out["chroma_ac"].reshape(-1),
        np.asarray(res["chroma_ac"]).reshape(-1))
