"""Fuzz + time the Pallas analyse-tail kernels vs the XLA chain on the
real chip (checkasm model).

    python tools/bench_probe_pallas.py [width height]
"""

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
from video_steganography_pcamv_tpu.encoder import me as ME
from video_steganography_pcamv_tpu.ops.probe_pallas import (
    analyse_tail_pallas)


def timeit(label, fn, n=4):
    fn()
    fn()
    t0 = time.time()
    for _ in range(n):
        fn()
    dt = (time.time() - t0) / n
    print(f"  {label:44s} {1000*dt:8.1f} ms", flush=True)
    return dt


def main(width=1920, height=1088, qp=26):
    mbh, mbw = height // 16, width // 16
    frames = synthetic_sequence(width, height, 2, seed=7)
    y = jnp.asarray(frames[1].y, jnp.int32)
    ref = mc.build_ref(jnp.asarray(frames[0].y, jnp.int32),
                       jnp.asarray(frames[0].u, jnp.int32),
                       jnp.asarray(frames[0].v, jnp.int32))
    prev = jnp.zeros((mbh, mbw, 2), jnp.int32)
    lam = ME.lambda_tab(qp)
    rng = 16

    st = PT.fullpel_search_parts(y, ref["luma"][0], prev, rng, mbh,
                                 mbw, lam)
    part, mvfp8 = PT.decide_partition(st, mbh, mbw, lam)
    planes = ref["luma"].astype(jnp.uint8)
    windows = PT.gather_windows8_mm(planes, mvfp8, mbh, mbw, rng)
    windows = windows.astype(jnp.uint8)
    windows.block_until_ready()

    # ---- XLA oracle chain (jitted whole: eager per-op dispatch over
    # the tunnel takes minutes at 1080p)
    @jax.jit
    def xla_tail(windows, part, mvfp8, prev):
        blocks8 = PT.block_table8(windows)
        wht8 = PT.wht8_flat(blocks8).astype(jnp.int16)
        # layout barrier — same trap as analyse_p_frame_parts: without
        # it XLA's remat materializes each 169-slice as its own
        # 128x-padded copy (observed 255 MB per slice at 1080p)
        blocks8, wht8 = jax.lax.optimization_barrier((blocks8, wht8))
        mv8, ridx, _ = PT.subpel_parts.__wrapped__(
            y, wht8, part, mvfp8, prev, mbh, mbw, lam, 2)
        SK, SP, sc8 = PT.probe_maps_xla(y, blocks8, wht8, ridx, qp,
                                        mbh, mbw, True)
        return mv8, ridx, SK, SP, sc8

    mv8_x, ridx_x, SK_x, SP_x, sc8_x = xla_tail(windows, part, mvfp8,
                                                prev)

    # ---- Pallas chain
    mv8_p, ridx_p, SK_p, SP_p, sc8_p = analyse_tail_pallas(
        y, windows, part, mvfp8, prev, lam, qp, mbh, mbw,
        decimate=True)

    for name, a, b in (("r_idx", ridx_x, ridx_p), ("mv8", mv8_x, mv8_p),
                       ("sc8", sc8_x, sc8_p), ("SK", SK_x, SK_p),
                       ("SP", SP_x, SP_p)):
        ok = np.array_equal(np.asarray(a), np.asarray(b))
        print(f"  {name:6s} match: {ok}")
        if not ok:
            aa, bb = np.asarray(a), np.asarray(b)
            bad = np.argwhere(aa != bb)
            print("   first mismatches:", bad[:5],
                  aa[tuple(bad[0])], bb[tuple(bad[0])])
            sys.exit(1)

    def xla_chain():
        out = xla_tail(windows, part, mvfp8, prev)
        return np.asarray(out[2][0, 0, 0, 0])

    def pallas_chain():
        out = analyse_tail_pallas(y, windows, part, mvfp8, prev, lam,
                                  qp, mbh, mbw, decimate=True)
        return np.asarray(out[2][0, 0, 0, 0])

    timeit("XLA tail (tables+subpel+maps)", xla_chain)
    timeit("Pallas tail (K1+K2+K3)", pallas_chain)

    # ---- per-stage decomposition of the Pallas chain
    from video_steganography_pcamv_tpu.ops import probe_pallas as PP
    n8 = 4 * mbh * mbw
    lane = PP._z_lane_order(mbh, mbw)
    inv = np.empty_like(lane)
    inv[lane] = np.arange(n8)
    prep = jax.jit(lambda w: w[jnp.asarray(inv)]
                   .reshape(n8, 1024).T.astype(jnp.int16))
    w1024 = prep(windows)
    pad = (-n8) % 128
    if pad:
        w1024 = jnp.pad(w1024, ((0, 0), (0, pad)))
    w1024.block_until_ready()
    timeit("  glue: window z-transpose", lambda: np.asarray(
        prep(windows)[0, 0]))
    timeit("  K1 tables", lambda: np.asarray(
        PP.qpel_tables_pallas(w1024)[1][0, 0]))
    b169, w169 = PP.qpel_tables_pallas(w1024)
    cur8 = y.reshape(2 * mbh, 8, 2 * mbw, 8).transpose(0, 2, 1, 3) \
        .reshape(n8, 64)
    cur64 = jnp.pad(cur8[jnp.asarray(inv)].T.astype(jnp.int16),
                    ((0, 0), (0, pad)))
    partz = jnp.pad(jnp.repeat(part.reshape(-1), 4).reshape(1, n8),
                    ((0, 0), (0, pad))).astype(jnp.int32)
    mvfz = jnp.pad(mvfp8.reshape(n8, 2)[jnp.asarray(inv)].T,
                   ((0, 0), (0, pad))).astype(jnp.int32)
    predz = jnp.pad(jnp.repeat(jnp.repeat(prev, 2, 0), 2, 1)
                    .reshape(n8, 2)[jnp.asarray(inv)].T,
                    ((0, 0), (0, pad))).astype(jnp.int32)
    timeit("  K2 subpel", lambda: np.asarray(
        PP.subpel_pallas(cur64, w169, partz, mvfz, predz, lam)[0]))
    ridx = PP.subpel_pallas(cur64, w169, partz, mvfz, predz, lam)
    timeit("  K3 probe maps", lambda: np.asarray(
        PP.probe_maps_pallas(cur64, b169, w169, ridx, qp)[0][0, 0]))
    # fused-at-once: one sync over the three kernels
    timeit("  K1+K2+K3 (one sync)", lambda: np.asarray(
        PP.probe_maps_pallas(
            cur64, *PP.qpel_tables_pallas(w1024),
            PP.subpel_pallas(cur64, PP.qpel_tables_pallas(w1024)[1],
                             partz, mvfz, predz, lam),
            qp)[0][0, 0]))


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*a)
