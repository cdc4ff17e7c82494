"""Per-stage wall budget of the fused stego P path on the real chip.

Times each host-visible phase of _encode_frame_ipp_fast by monkey-
patching sync points (scalar syncs only — full-array np.asarray through
the tunnel inflates numbers, docs/PERF.md). Run on TPU:

    python tools/profile_stage.py [width height n_frames]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/pcamv_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import numpy as np

from video_steganography_pcamv_tpu.params import Params, StegoParams
from video_steganography_pcamv_tpu.utils.yuv import synthetic_sequence
from video_steganography_pcamv_tpu.encoder import core as CORE
from video_steganography_pcamv_tpu.encoder.core import Encoder


def main(width=1920, height=1088, n=6):
    frames = synthetic_sequence(width, height, 3, seed=7)
    p = Params(width=width, height=height, qp=26, me_range=16,
               deblock_device=True, psnr=False,
               stego=StegoParams(em_rate=64.0, key=99))
    enc = Encoder(p)

    marks = []

    def wrap(obj, name, label):
        fn = getattr(obj, name)

        def timed(*a, **k):
            t0 = time.time()
            r = fn(*a, **k)
            marks.append((label, time.time() - t0))
            return r
        setattr(obj, name, timed)

    # phase boundaries on the encoder instance
    wrap(enc, "_fused_dispatch", "dispatch(stage1)")
    wrap(enc, "_fused_complete", "complete(pull+stc+reenc+lev+deblk)")
    wrap(enc, "_finish_p_slice", "entropy")
    wrap(enc.lookahead, "costs_device", "lookahead_dispatch")
    wrap(enc._stego, "apply_costs", "stc+flips(host)")
    orig_res = CORE._res_to_host

    def timed_res(*a, **k):
        t0 = time.time()
        r = orig_res(*a, **k)
        marks.append(("levels_pull", time.time() - t0))
        return r
    CORE._res_to_host = timed_res
    orig_db = enc._deblock_device

    def timed_db(*a, **k):
        t0 = time.time()
        r = orig_db(*a, **k)
        marks.append(("deblock_dispatch", time.time() - t0))
        return r
    enc._deblock_device = timed_db

    # warmup (compile)
    enc.encode_frame(frames[0])
    enc.encode_frame(frames[1])
    marks.clear()

    t0 = time.time()
    per_frame = []
    for i in range(n):
        f0 = time.time()
        enc.encode_frame(frames[2])
        per_frame.append(time.time() - f0)
    total = time.time() - t0

    agg = {}
    for label, dt in marks:
        agg.setdefault(label, []).append(dt)
    print(f"\n== {width}x{height}, {n} frames, "
          f"{n/total:.3f} fps ({total/n*1000:.0f} ms/frame) ==")
    for label, ds in sorted(agg.items(), key=lambda kv: -sum(kv[1])):
        print(f"  {label:36s} {1000*np.mean(ds):8.1f} ms/frame "
              f"(n={len(ds)})")
    # note: complete() includes the packed pull (blocks until stage1
    # finishes) + host STC + re-encode dispatch + levels pull + deblock
    print("  frame times:", " ".join(f"{x:.2f}" for x in per_frame))


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*a)
