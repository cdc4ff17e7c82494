"""Micro-decomposition of the fused stage-1 internals on the real
chip: the qpel block/WHT tables, subpel, fullpel kernel, probe stage
and re-encode — each timed alone with scalar syncs. Feeds the round-5
mega-kernel plan (docs/PERF.md roofline section).

    python tools/profile_micro.py [width height]
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
from video_steganography_pcamv_tpu.encoder import inter as INTER
from video_steganography_pcamv_tpu.encoder import me as ME
from video_steganography_pcamv_tpu.encoder.scan_device import scan_p_device
from video_steganography_pcamv_tpu.stego.cost import cost_mv_table


def sync(x):
    return np.asarray(x.reshape(-1)[0])


def timeit(label, fn, n=4):
    fn()  # compile
    fn()
    t0 = time.time()
    for _ in range(n):
        fn()
    dt = (time.time() - t0) / n
    print(f"  {label:40s} {1000*dt:8.1f} ms", flush=True)
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

    from video_steganography_pcamv_tpu.ops.pallas_kernels import \
        fullpel_parts_pallas

    def a_fullpel():
        st = fullpel_parts_pallas(y, ref["luma"][0], rng, mbh, mbw, lam)
        return sync(st["mv16"])
    timeit("fullpel_parts_pallas", a_fullpel)

    st = fullpel_parts_pallas(y, ref["luma"][0], rng, mbh, mbw, lam)
    part, mvfp8 = PT.decide_partition(st, mbh, mbw, lam, True)

    @jax.jit
    def j_decide(st):
        return PT.decide_partition.__wrapped__(st, mbh, mbw, lam, True)

    timeit("decide_partition", lambda: sync(j_decide(st)[0]))

    planes_u8 = ref["luma"].astype(jnp.uint8)

    @jax.jit
    def j_windows(planes, mvfp8):
        return PT.gather_windows8_jnp(planes, mvfp8, mbh, mbw)

    timeit("gather_windows8 (XLA gather)",
           lambda: sync(j_windows(planes_u8, mvfp8)))
    windows = j_windows(planes_u8, mvfp8)

    @jax.jit
    def j_table(windows):
        return PT.block_table8(windows)

    timeit("block_table8 (169 slice-avgs)",
           lambda: sync(j_table(windows)))
    blocks8 = j_table(windows)

    @jax.jit
    def j_wht(blocks8):
        return PT.wht8_flat(blocks8).astype(jnp.int16)

    timeit("wht8_flat (169 WHTs)", lambda: sync(j_wht(blocks8)))
    wht8 = j_wht(blocks8)

    @jax.jit
    def j_subpel(wht8, part, mvfp8, prev):
        return PT.subpel_parts.__wrapped__(y, wht8, part, mvfp8, prev,
                                           mbh, mbw, lam, subpel)

    timeit("subpel_parts (49-offset box)",
           lambda: sync(j_subpel(wht8, part, mvfp8, prev)[0]))
    mv8, r_idx8, _ = j_subpel(wht8, part, mvfp8, prev)

    res = INTER.encode_p_frame_device8(
        y, u, v, ref["luma"], ref["u"], ref["v"], mv8, qp, qpc,
        mbh, mbw, decimate=True)
    cbp_l = res["cbp_luma"].astype(jnp.int32)
    cbp_c = res["cbp_chroma"].astype(jnp.int32)
    _, _, mvp_u, _ = scan_p_device(part, mv8, cbp_l, cbp_c, mbh, mbw)

    def a_probes():
        rho, alt, _ = PT.stego_costs_parts(
            y, blocks8, wht8, r_idx8, part, mv8, mvp_u, cmv, qp,
            mbh, mbw, decimate=True)
        return sync(rho)
    timeit("stego_costs_parts", a_probes)

    # re-encode halves (the _fused_complete device work)
    from video_steganography_pcamv_tpu.encoder.inter_incr import (
        reencode_p_incremental, pad_subset)
    res_full = INTER.encode_p_frame_device8(
        y, u, v, ref["luma"], ref["u"], ref["v"], mv8, qp, qpc,
        mbh, mbw, decimate=True, cbp_only=False)
    n = mbh * mbw
    idx = np.arange(64)          # typical flip count scale
    idx_p, fz_p, cap = pad_subset(idx, np.zeros_like(idx), n)

    def a_incr():
        r2 = reencode_p_incremental(
            res_full, y, u, v, ref["luma"], ref["u"], ref["v"],
            mv8, jnp.asarray(idx_p), jnp.asarray(fz_p), qp, qpc,
            mbh, mbw, cap, decimate=True)
        return sync(r2["cbp_luma"])
    timeit("reencode_p_incremental (64 MBs)", a_incr)

    # deblock (pallas)
    from video_steganography_pcamv_tpu.ops.deblock_pallas import \
        deblock_frame_pallas
    nnz4 = jnp.zeros((4 * mbh, 4 * mbw), jnp.int32)
    mv4 = jnp.zeros((4 * mbh, 4 * mbw, 2), jnp.int32)
    intra = jnp.zeros((mbh, mbw), jnp.int32)
    skip = jnp.zeros((mbh, mbw), jnp.int32)

    def a_deblock():
        dy, du, dv = deblock_frame_pallas(
            res_full["recon_y"].astype(jnp.int32),
            res_full["recon_u"].astype(jnp.int32),
            res_full["recon_v"].astype(jnp.int32),
            intra, skip, nnz4, mv4, qp, qpc, mbh, mbw)
        return sync(dy)
    timeit("deblock_frame_pallas", a_deblock)

    # lookahead
    from video_steganography_pcamv_tpu.encoder.slicetype import Lookahead
    from video_steganography_pcamv_tpu.params import Params
    la = Lookahead(Params(width=width, height=height))
    la.prev_lr = None
    la.decide(y)          # seeds prev_lr

    def a_lookahead():
        return sync(la.costs_device(y))
    timeit("lookahead costs_device", a_lookahead)


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*a)
