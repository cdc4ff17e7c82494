"""Device CAVLC bit-size estimator vs the serial writer (checkasm
pattern: batched kernel vs oracle on random sparse blocks)."""

import numpy as np
import jax.numpy as jnp

from video_steganography_pcamv_tpu.ops.rdcost import cavlc_block_bits
from video_steganography_pcamv_tpu.encoder.cavlc import write_residual
from video_steganography_pcamv_tpu.utils.bitstream import BitWriter

rng = np.random.RandomState(9)


def oracle_bits(levels, max_coeff, nc):
    bw = BitWriter()
    write_residual(bw, [int(x) for x in levels], max_coeff, int(nc))
    return int(bw.bit_length())


def _random_blocks(n, mc, density, mag):
    lev = np.zeros((n, mc), np.int32)
    for i in range(n):
        k = rng.randint(0, max(2, int(mc * density)))
        pos = rng.choice(mc, size=k, replace=False)
        lev[i, pos] = rng.randint(1, mag + 1, k) * \
            rng.choice([-1, 1], k)
    return lev


def test_cavlc_bits_matches_writer_4x4():
    for density, mag in [(0.2, 1), (0.4, 3), (0.8, 12), (1.0, 40),
                         (0.3, 300)]:
        lev = _random_blocks(64, 16, density, mag)
        nc = rng.randint(0, 17, 64)
        got = np.asarray(cavlc_block_bits(jnp.asarray(lev),
                                          jnp.asarray(nc)))
        for i in range(64):
            exp = oracle_bits(lev[i], 16, nc[i])
            assert got[i] == exp, (density, mag, i, lev[i], nc[i],
                                   got[i], exp)


def test_cavlc_bits_matches_writer_chroma_dc():
    lev = _random_blocks(48, 4, 1.0, 8)
    nc = np.full(48, -1)
    got = np.asarray(cavlc_block_bits(jnp.asarray(lev),
                                      jnp.asarray(nc), max_coeff=4))
    for i in range(48):
        exp = oracle_bits(lev[i], 4, -1)
        assert got[i] == exp, (i, lev[i], got[i], exp)


def test_cavlc_bits_trailing_one_edge_cases():
    cases = [
        [0] * 16,
        [1] + [0] * 15,
        [-1, 1, -1, 1] + [0] * 12,          # 4 ones: t1s caps at 3
        [5, 1, 1, 1] + [0] * 12,
        [0, 0, 7, 0, 0, -1, 0, 1] + [0] * 8,
        [2] * 16,
        [1] * 16,
    ]
    lev = np.array(cases, np.int32)
    nc = np.array([0, 1, 3, 5, 9, 2, 16])
    got = np.asarray(cavlc_block_bits(jnp.asarray(lev),
                                      jnp.asarray(nc)))
    for i in range(len(cases)):
        exp = oracle_bits(lev[i], 16, nc[i])
        assert got[i] == exp, (i, lev[i], got[i], exp)


def test_rd_mode_decision_improves_objective():
    """--rd 1 (transform RD + intra RD ranking) must not worsen the
    SSD + lambda2*bits objective, and streams stay bit-exact."""
    import jax
    from video_steganography_pcamv_tpu.params import Params, StegoParams
    from video_steganography_pcamv_tpu.encoder.core import Encoder
    from video_steganography_pcamv_tpu.decoder import decode_annexb
    from tests.test_dct8_e2e import _pan_frames, W, H

    frames = _pan_frames(5)
    out = {}
    for rd in (0, 1):
        p = Params(width=W, height=H, qp=27, me_range=8,
                   transform_8x8=True, rd=rd,
                   stego=StegoParams(em_rate=16.0, key=3))
        enc = Encoder(p)
        enc.keep_recon = True
        bs = b"".join(enc.encode_frame(f) for f in frames)
        dec = decode_annexb(bs)
        for i, d in enumerate(dec):
            ry = enc.recon_by_disp[i][0][:H, :W].astype(np.uint8)
            np.testing.assert_array_equal(d.y, ry,
                                          err_msg=f"rd={rd} f{i}")
        ssd = sum(int(np.sum(
            (enc.recon_by_disp[i][0][:H, :W].astype(np.int64)
             - frames[i].y) ** 2)) for i in range(5))
        out[rd] = (len(bs), ssd)
    lam2 = 5851 / 256.0  # qp 27
    c0 = out[0][1] + lam2 * 8 * out[0][0]
    c1 = out[1][1] + lam2 * 8 * out[1][0]
    assert c1 <= c0 * 1.002, (out, c0, c1)


def test_rd2_skip_probe():
    """--rd 2 (P_SKIP RD probe): near-static content must gain skips
    and save bits vs --rd 1, and the stream stays bit-exact."""
    import numpy as np
    from video_steganography_pcamv_tpu.params import Params
    from video_steganography_pcamv_tpu.utils.yuv import Frame
    from video_steganography_pcamv_tpu.encoder.core import Encoder
    from video_steganography_pcamv_tpu.decoder import decode_annexb
    W, H = 128, 96
    rng = np.random.RandomState(2)
    base = rng.randint(30, 220, (H, W)).astype(np.uint8)
    base = ((base.astype(np.int32) + np.roll(base, 1, 0)
             + np.roll(base, 1, 1)) // 3).astype(np.uint8)
    frames = []
    for i in range(4):
        # slow brightness ramp + a moving block: the ramp leaves a
        # structured low-level residual (survives decimation, not
        # auto-skip) that the RD probe should fold into skips
        y = np.clip(base.astype(np.int32) + 4 * i, 0, 255) \
            .astype(np.uint8)
        y[40:56, 40:56] = np.roll(base[40:56, 40:56], i, axis=1)
        frames.append(Frame(y, np.full((H // 2, W // 2), 100, np.uint8),
                            np.full((H // 2, W // 2), 140, np.uint8)))

    sizes, skips = [], []
    for rd in (1, 2):
        p = Params(width=W, height=H, qp=32, me_range=8, rd=rd)
        enc = Encoder(p)
        enc.keep_recon = True
        bs = b"".join(enc.encode_frame(f) for f in frames)
        dec = decode_annexb(bs)
        for i, d in enumerate(dec):
            ry = enc.recon_by_disp[i][0][:H, :W].astype(np.uint8)
            np.testing.assert_array_equal(d.y, ry,
                                          err_msg=f"rd={rd} frame {i}")
        sizes.append(len(bs))
        skips.append(sum(1 for d in dec for m in d.mbs
                         if m.mb_type == "SKIP"))
    assert skips[1] > skips[0], skips
    assert sizes[1] < sizes[0], sizes



def test_rd2_qpel_refine():
    """--rd 2 qpel RD refine (x264_me_refine_qpel_rd analog): the
    SATD subpel decision is LUMA-only; with strong moving chroma the
    exact-RD probe (luma+chroma SSD + real bits) must move MVs, and
    the stream stays bit-exact (the rescan re-derives mvds + P_SKIP
    MVs in the changed neighbour context)."""
    import numpy as np
    from video_steganography_pcamv_tpu.params import Params
    from video_steganography_pcamv_tpu.utils.yuv import Frame
    from video_steganography_pcamv_tpu.encoder.core import Encoder
    from video_steganography_pcamv_tpu.decoder import decode_annexb
    W, H = 128, 96
    rng = np.random.RandomState(5)
    pad = 32
    gy, gx = np.mgrid[0:H + 2 * pad, 0:W + 2 * pad]
    luma_big = (120 + 8 * np.sin(gx / 7.0) + 8 * np.cos(gy / 9.0)) \
        .astype(np.uint8)
    cg_y, cg_x = np.mgrid[0:(H + 2 * pad) // 2, 0:(W + 2 * pad) // 2]
    chroma_big = (128 + 60 * np.sign(np.sin(cg_x / 2.5)
                                     * np.sin(cg_y / 3.0))) \
        .clip(0, 255).astype(np.uint8)
    frames = []
    for i in range(4):
        y = luma_big[pad + i:pad + i + H,
                     pad + 2 * i:pad + 2 * i + W].copy()
        y = np.clip(y.astype(np.int32)
                    + (rng.randn(H, W) * 2).astype(np.int32),
                    0, 255).astype(np.uint8)
        cu = chroma_big[(pad + i) // 2:(pad + i) // 2 + H // 2,
                        (pad + 2 * i) // 2:
                        (pad + 2 * i) // 2 + W // 2].copy()
        frames.append(Frame(y, cu, 255 - cu))

    p = Params(width=W, height=H, qp=30, me_range=8, rd=2)
    enc = Encoder(p)
    enc.keep_recon = True
    changed = 0
    bs = b""
    for f in frames:
        bs += enc.encode_frame(f)
        changed += getattr(enc, "_last_qpel_changed", 0)
        enc._last_qpel_changed = 0
    dec = decode_annexb(bs)
    for i, d in enumerate(dec):
        ry = enc.recon_by_disp[i][0][:H, :W].astype(np.uint8)
        np.testing.assert_array_equal(d.y, ry, err_msg=f"frame {i}")
        ru = enc.recon_by_disp[i][1][:H // 2, :W // 2] \
            .astype(np.uint8)
        np.testing.assert_array_equal(d.u, ru, err_msg=f"frame {i} U")
    assert changed > 0, "qpel RD refine never moved an MV"
