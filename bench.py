"""Round benchmark: 1080p encode+embed throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N/30}
Baseline: BASELINE.json north star = 30 fps/chip 1080p encode+embed.

Runs on whatever backend the driver provides (real TPU under axon).
Measures the full pipeline: device analyse/encode/stego + host scan +
CAVLC entropy + STC. First I+P frames are compile warmup and excluded.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run(width=1920, height=1088, n_measure=6, qp=26, em_rate=64.0):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/pcamv_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import numpy as np
    from video_steganography_pcamv_tpu.params import Params, StegoParams
    from video_steganography_pcamv_tpu.utils.yuv import synthetic_sequence
    from video_steganography_pcamv_tpu.encoder.core import Encoder
    from video_steganography_pcamv_tpu.stego.extract import (
        extract_from_stream)

    frames = synthetic_sequence(width, height, 3, seed=7)
    # serving configuration: reference stays on-device (wavefront
    # deblock twin), metrics off (x264 also computes PSNR only when
    # asked); levels cross the tunnel as one packed transfer
    p = Params(width=width, height=height, qp=qp, me_range=16,
               deblock_device=True, psnr=False,
               stego=StegoParams(em_rate=em_rate, key=99))
    enc = Encoder(p)

    # warmup / compile: I frame + first P frame
    bs = enc.encode_frame(frames[0])
    bs += enc.encode_frame(frames[1])

    t0 = time.time()
    done = 0
    for i in range(n_measure):
        bs += enc.encode_frame(frames[2 + (i % 1)])
        done += 1
        if time.time() - t0 > 600:
            break
    bs += enc.flush()   # pipelined driver: drain the deferred entropy
    elapsed = time.time() - t0
    fps = done / elapsed

    # payload-recovery check rides along (correctness gate for the bench)
    got = extract_from_stream(bs, em_rate=em_rate, key=99)
    sent = enc._stego.sent_messages
    recovered = all(np.array_equal(g, s) for g, s in zip(got, sent))
    return fps, recovered


def main():
    try:
        fps, recovered = run()
        metric = "encode_embed_fps_1080p"
        if not recovered:
            metric += "_PAYLOAD_LOSS"
        print(json.dumps({
            "metric": metric,
            "value": round(fps, 4),
            "unit": "fps",
            "vs_baseline": round(fps / 30.0, 5),
        }))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({
            "metric": "encode_embed_fps_1080p",
            "value": 0.0,
            "unit": "fps",
            "vs_baseline": 0.0,
            "error": str(e)[:200],
        }))


if __name__ == "__main__":
    main()
