"""Kernel correctness + timing harness (the reference's `checkasm
--bench`, tools/checkasm.c:222-1561, re-imagined for Pallas-vs-XLA):
every Pallas kernel is checked against its jnp twin on random inputs,
then both sides are cycle^W wall-clock timed.

    python tools/benchkernels.py [--tpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    import numpy as np
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


_TIMINGS = {}


def bench(name, fn, n_it=5):
    out = fn()
    _sync(out)          # warmup: compile excluded from the timing
    t0 = time.time()
    for _ in range(n_it):
        out = fn()
    _sync(out)
    dt = (time.time() - t0) / n_it
    _TIMINGS[name] = dt
    print(f"  {name:<44s} {dt * 1000:9.2f} ms")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--mbh", type=int, default=34)   # 544p default
    ap.add_argument("--mbw", type=int, default=60)
    ap.add_argument("--json", action="store_true",
                    help="print a final JSON line of timings "
                         "(tools/perf_gate.py consumes it)")
    args = ap.parse_args()
    if not args.tpu:
        import tools.cpu_env  # noqa: F401
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/pcamv_jax"))
    import numpy as np
    import jax.numpy as jnp
    from video_steganography_pcamv_tpu.ops import mc
    from video_steganography_pcamv_tpu.ops import pallas_kernels as PK
    from video_steganography_pcamv_tpu.encoder import partition as PT
    from video_steganography_pcamv_tpu.encoder import inter as I
    from video_steganography_pcamv_tpu.encoder import me as ME
    from video_steganography_pcamv_tpu.ops import transform as T

    mbh, mbw = args.mbh, args.mbw
    H, W = 16 * mbh, 16 * mbw
    n = mbh * mbw
    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.RandomState(0)
    cur = jnp.asarray(rng.randint(0, 256, (H, W)), jnp.int32)
    refp = mc.pad_plane(jnp.asarray(rng.randint(0, 256, (H, W)),
                                    jnp.int32))
    planes = jnp.stack([refp] * 4)
    prev = jnp.zeros((mbh, mbw, 2), jnp.int32)
    print(f"kernel bench at {W}x{H} "
          f"({'TPU pallas' if on_tpu else 'CPU interpret twins'})")

    # checks (checkasm equivalence part)
    st_j = PT.fullpel_search_parts(cur, refp, prev, 8, mbh, mbw, 4)
    st_p = PK.fullpel_parts_pallas(cur, refp, 8, mbh, mbw, 4,
                                   interpret=not on_tpu)
    for k in st_j:
        assert np.array_equal(np.asarray(st_j[k]), np.asarray(st_p[k])), k
    print("  fullpel_parts: pallas == jnp twin (8 outputs)")
    mvfp8 = jnp.asarray(rng.randint(-8, 9, (2 * mbh, 2 * mbw, 2)),
                        jnp.int32)
    if not on_tpu:  # banked DMA blocked by Mosaic 128-wide lane rule
        wb = PK.gather_windows8_banked(planes, mvfp8, mbh, mbw,
                                       interpret=True)
        wj = PT.gather_windows8_jnp(planes, mvfp8, mbh, mbw)
        assert np.array_equal(np.asarray(wb), np.asarray(wj))
        print("  gather_windows8: banked DMA == XLA gather (interpret)")
    cur_mb = cur.reshape(mbh, 16, mbw, 16).transpose(0, 2, 1, 3) \
                .reshape(n, 16, 16)
    pred_mb = jnp.asarray(
        np.clip(np.asarray(cur_mb) + rng.randint(-30, 31, (n, 16, 16)),
                0, 255), jnp.int32)
    l1, r1 = I.luma_p_encode(cur_mb, pred_mb, 26, True)
    l2, r2 = I.luma_p_encode_fast(cur_mb, pred_mb, 26, True)
    assert np.array_equal(np.asarray(l1), np.asarray(l2))
    assert np.array_equal(np.asarray(r1), np.asarray(r2))
    print("  luma_p_encode: pallas fused == XLA chain")

    # timings (--bench part)
    bench("fullpel_parts (pallas)" if on_tpu else
          "fullpel_parts (interpret)",
          lambda: PK.fullpel_parts_pallas(cur, refp, 8, mbh, mbw, 4,
                                          interpret=not on_tpu),
          n_it=3 if on_tpu else 1)
    bench("fullpel_parts (jnp scan)",
          lambda: PT.fullpel_search_parts(cur, refp, prev, 8, mbh,
                                          mbw, 4), n_it=1)
    gw = jax.jit(lambda m: PT.gather_windows8_jnp(planes, m, mbh, mbw))
    bench("gather_windows8 (XLA gather)", lambda: gw(mvfp8))
    lpe = jax.jit(lambda c, p: I.luma_p_encode(c, p, 26, True))
    lpf = jax.jit(lambda c, p: I.luma_p_encode_fast(c, p, 26, True))
    bench("luma_p_encode (XLA)", lambda: lpe(cur_mb, pred_mb))
    bench("luma_p_encode_fast (pallas)", lambda: lpf(cur_mb, pred_mb))
    mvr = jnp.asarray(rng.randint(-32, 33, (n, 2)), jnp.int32)
    mcf = jax.jit(lambda m: mc.mc_luma(
        planes, (jnp.arange(n) // mbw) * 16, (jnp.arange(n) % mbw) * 16,
        m))
    bench("mc_luma qpel gather [n MBs]", lambda: mcf(mvr))
    print("done")
    if args.json:
        import json
        print(json.dumps(_TIMINGS))


if __name__ == "__main__":
    main()
