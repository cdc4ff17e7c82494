"""Decompose the fused stage-1 program's device time: each sub-program
timed alone (scalar sync), then the fused whole. Run on TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/pcamv_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
import numpy as np

from video_steganography_pcamv_tpu.utils.yuv import synthetic_sequence
from video_steganography_pcamv_tpu.ops import mc
from video_steganography_pcamv_tpu.encoder import partition as PT
from video_steganography_pcamv_tpu.encoder import inter as INTER
from video_steganography_pcamv_tpu.encoder import me as ME
from video_steganography_pcamv_tpu.encoder.scan_device import scan_p_device
from video_steganography_pcamv_tpu.stego.cost import cost_mv_table


def sync(x):
    return np.asarray(x.reshape(-1)[0])


def timeit(label, fn, n=4):
    fn()  # compile
    sync_v = fn()
    t0 = time.time()
    for _ in range(n):
        out = fn()
    dt = (time.time() - t0) / n
    print(f"  {label:34s} {1000*dt:8.1f} ms")
    return dt


def main(width=1920, height=1088):
    mbh, mbw = height // 16, width // 16
    frames = synthetic_sequence(width, height, 2, seed=7)
    y = jnp.asarray(frames[1].y, jnp.int32)
    u = jnp.asarray(frames[1].u, jnp.int32)
    v = jnp.asarray(frames[1].v, jnp.int32)
    ref = mc.build_ref(jnp.asarray(frames[0].y, jnp.int32),
                       jnp.asarray(frames[0].u, jnp.int32),
                       jnp.asarray(frames[0].v, jnp.int32))
    prev = jnp.zeros((mbh, mbw, 2), jnp.int32)
    qp, qpc = 26, 26
    lam = ME.lambda_tab(qp)
    cmv = jnp.asarray(cost_mv_table(lam))
    rng, subpel = 16, 2

    def a_analyse():
        out = PT.analyse_p_frame_parts(y, ref["luma"], prev, rng, mbh,
                                       mbw, lam, subpel, use_pallas=True)
        return sync(out[1])
    timeit("analyse_p_frame_parts", a_analyse)

    part, mv8, r_idx8, blocks8, wht8, _ = PT.analyse_p_frame_parts(
        y, ref["luma"], prev, rng, mbh, mbw, lam, subpel, use_pallas=True)

    def a_encode():
        res = INTER.encode_p_frame_device8(
            y, u, v, ref["luma"], ref["u"], ref["v"], mv8, qp, qpc,
            mbh, mbw, decimate=True)
        return sync(res["cbp_luma"])
    timeit("encode_p_frame_device8 (full)", a_encode)

    def a_encode_cbp():
        res = INTER.encode_p_frame_device8(
            y, u, v, ref["luma"], ref["u"], ref["v"], mv8, qp, qpc,
            mbh, mbw, decimate=True, cbp_only=True)
        return sync(res["cbp_luma"])
    timeit("encode (cbp_only)", a_encode_cbp)

    res = INTER.encode_p_frame_device8(
        y, u, v, ref["luma"], ref["u"], ref["v"], mv8, qp, qpc,
        mbh, mbw, decimate=True)
    cbp_l = res["cbp_luma"].astype(jnp.int32)
    cbp_c = res["cbp_chroma"].astype(jnp.int32)

    def a_scan():
        s, mvd, mvp, _ = scan_p_device(part, mv8, cbp_l, cbp_c, mbh, mbw)
        return sync(mvp)
    timeit("scan_p_device", a_scan)

    _, _, mvp_u, _ = scan_p_device(part, mv8, cbp_l, cbp_c, mbh, mbw)

    def a_probes():
        rho, alt, _ = PT.stego_costs_parts(
            y, blocks8, wht8, r_idx8, part, mv8, mvp_u, cmv, qp,
            mbh, mbw, decimate=True)
        return sync(rho)
    timeit("stego_costs_parts", a_probes)

    def a_fused():
        packed, res2, b8, w8, r8 = PT.p_stage1_stego(
            y, u, v, ref["luma"], ref["u"], ref["v"], prev, qp, qpc,
            lam, cmv, rng, mbh, mbw, subpel, True, True, False)
        return sync(packed)
    timeit("p_stage1_stego (fused, XLA tail)", a_fused)

    def a_fused_k():
        packed, res2, b8, w8, r8 = PT.p_stage1_stego(
            y, u, v, ref["luma"], ref["u"], ref["v"], prev, qp, qpc,
            lam, cmv, rng, mbh, mbw, subpel, True, True, False,
            tail_kernel=True)
        return sync(packed)
    timeit("p_stage1_stego (fused, Pallas tail)", a_fused_k)

    def a_fused_pull():
        packed, res2, b8, w8, r8 = PT.p_stage1_stego(
            y, u, v, ref["luma"], ref["u"], ref["v"], prev, qp, qpc,
            lam, cmv, rng, mbh, mbw, subpel, True, True, False,
            tail_kernel=True)
        return np.asarray(packed)
    timeit("fused (Pallas tail) + packed pull", a_fused_pull)

    # the serving path's MC/window one-hot selects, alone
    from video_steganography_pcamv_tpu.encoder.partition import (
        gather_windows8_mm)
    planes_u8 = ref["luma"].astype(jnp.uint8)
    j_wmm = jax.jit(lambda m: gather_windows8_mm(planes_u8, m, mbh,
                                                 mbw, rng))
    mvfp8 = jnp.zeros((2 * mbh, 2 * mbw, 2), jnp.int32)
    timeit("gather_windows8_mm (one-hot MXU)",
           lambda: sync(j_wmm(mvfp8)))


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*a)
