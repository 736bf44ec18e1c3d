"""Multi-stream serving scaling: aggregate audio-s/s vs stream count
-> benchmarks/multistream_scale.json.

MultiStreamTranscriber advances S concurrent real-time sessions through
ONE jitted chunk step (stream index = batch dim, danspeech_tpu/
multistream.py). The per-chunk cost is dominated by the dispatch round
trip and per-frame matvecs whose M dim is S — so aggregate throughput
should scale nearly linearly until S fills the MXU's 128 batch lanes.
This probe measures S in {8, 32, 64, 128} with 1 s chunks (the RTF
config 4.5 workload shape) and commits the curve.

Usage: python benchmarks/multistream_scale.py [--iters 3]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_streaming():
    from danspeech_tpu.models import DeepSpeechModel, deepspeech as ds
    from danspeech_tpu.models.config import DeepSpeechConfig

    cfg = DeepSpeechConfig(
        model_name="CPUStreamingRNN", rnn_hidden_size=800, rnn_layers=5,
        conv_layers=2, bidirectional=False, context=20, streaming_model=True,
    )
    return DeepSpeechModel(
        cfg, ds.cast_matmul_weights(ds.init_params(cfg, seed=0))
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--streams", type=int, nargs="*", default=[8, 32, 64, 128])
    args = ap.parse_args()

    from danspeech_tpu.audio import load_audio_pcm16
    from danspeech_tpu.multistream import MultiStreamTranscriber

    model = build_streaming()
    waves = [
        load_audio_pcm16(p).astype(np.float32)
        for p in sorted(glob.glob("/root/reference/example_files/*.wav"))
    ]
    chunk = 16000  # 1 s
    n_chunks = len(waves[0]) // chunk
    long_buf = np.concatenate(waves)

    rows = []
    for s_count in args.streams:
        streams = [
            long_buf[(s * 16000) % (len(long_buf) - n_chunks * chunk):][
                : n_chunks * chunk
            ]
            for s in range(s_count)
        ]
        ms = MultiStreamTranscriber(model, n_streams=s_count)

        def run():
            for ci in range(n_chunks):
                ms.step(
                    [st[ci * chunk : (ci + 1) * chunk] for st in streams],
                    is_last=(ci == n_chunks - 1),
                    is_first=(ci == 0),
                )

        run()  # warm/compile this S
        t0 = time.perf_counter()
        for _ in range(args.iters):
            run()
        dt = (time.perf_counter() - t0) / args.iters
        rate = s_count * n_chunks * (chunk / 16000.0) / dt
        rows.append({
            "streams": s_count,
            "audio_s_per_s_chip": round(rate, 1),
            "per_chunk_ms": round(dt / n_chunks * 1e3, 1),
            "realtime_factor_per_stream": round(rate / s_count, 2),
        })
        print(json.dumps(rows[-1]), flush=True)

    out = {
        "setup": (
            f"CPUStreamingRNN shape (5x800 uni + lookahead), 1 s chunks, "
            f"{n_chunks} chunks/stream, iters={args.iters}, one jitted "
            f"cohort step per chunk, TPU v5e 1 chip (r5)"
        ),
        "results": rows,
        "note": (
            "aggregate audio-s/s = streams x chunk-seconds / wall time; "
            "realtime_factor_per_stream > 1 means every session keeps up "
            "in real time. On this environment's relay the cohort step is "
            "TRANSFER-bound: each chunk uploads a (S, 161, ~104) float32 "
            "feature block through the post-fetch ~15-50 MB/s band "
            "(tunnel_characterization.json), so aggregate throughput "
            "flattens with S; on a PCIe-attached host the same path is "
            "compute-bound at the device chunk-step cost."
        ),
    }
    print(json.dumps(out, indent=2))
    with open(os.path.join(REPO, "benchmarks", "multistream_scale.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
