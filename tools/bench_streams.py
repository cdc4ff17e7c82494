"""Single-chip multi-stream throughput: aggregate encode+embed fps at
S = 1, 2, 4 concurrent 1080p streams (BASELINE ladder rung 5 on one
chip; the driver is PipelinedMultiEncoder — per-stream fused stage-1
dispatches keep the device queue fed while the host writes the other
streams' entropy).

Run on TPU (the default axon backend). Prints one JSON line per S.
"""

import json
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
from video_steganography_pcamv_tpu.encoder.multistream import (
    PipelinedMultiEncoder)
from video_steganography_pcamv_tpu.stego.extract import extract_from_stream
from video_steganography_pcamv_tpu.utils.yuv import synthetic_sequence


def run(S, width=1920, height=1088, n_measure=6, qp=26, em_rate=64.0):
    p = Params(width=width, height=height, qp=qp, me_range=16,
               keyint_max=250, scenecut_threshold=0, psnr=False,
               deblock_device=True,
               stego=StegoParams(em_rate=em_rate, key=3))
    # deep pipeline per stream: each stream's packed pull otherwise
    # idles the device (round-5 measurement: S=2 aggregate BELOW
    # single-stream on the standard pipelined driver)
    p.pipeline_deep = os.environ.get("PCAMV_BENCH_DEEP", "0") != "0"
    p.validate()
    me = PipelinedMultiEncoder(p, S)
    streams = [synthetic_sequence(width, height, 4 + n_measure,
                                  seed=40 + s) for s in range(S)]
    chunks = [b"" for _ in range(S)]
    # warmup: IDR + 3 P frames (compiles + pipeline fill)
    for t in range(4):
        for s, c in enumerate(me.encode_step(
                [st[t] for st in streams])):
            chunks[s] += c
    t0 = time.time()
    for t in range(4, 4 + n_measure):
        for s, c in enumerate(me.encode_step(
                [st[t] for st in streams])):
            chunks[s] += c
    for s, c in enumerate(me.flush()):
        chunks[s] += c
    dt = time.time() - t0
    # payload must survive blind extraction on every stream
    for s in range(S):
        got = extract_from_stream(chunks[s], em_rate=em_rate, key=3)
        sent = me.encs[s]._stego.sent_messages
        assert len(got) == len(sent) and all(
            np.array_equal(g, m) for g, m in zip(got, sent)), \
            f"stream {s}: blind extraction mismatch"
    agg = S * n_measure / dt
    return {"metric": "multistream_agg_fps_1080p", "streams": S,
            "value": round(agg, 4), "unit": "fps",
            "per_stream": round(agg / S, 4)}


def main():
    for S in (1, 2, 4):
        print(json.dumps(run(S)), flush=True)


if __name__ == "__main__":
    main()
