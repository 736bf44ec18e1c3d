"""Beam-decode throughput harness -> benchmarks/beam_throughput.json.

Measures the decoders behind ``update_decoder(backend=...)`` on the real
chip with the flagship decode shape: B=128 rows of T=400 frames (8 s of
audio each at the model's 20 ms frame hop), C=33 classes, beam 64,
blank-dominated synthetic CTC posteriors, and a synthetic 3-gram LM
(scoring cost is LM-content-independent; the zoo LMs need network).

Configurations:
  - host C++ (native/ctcbeam, multi-threaded)
  - device LM-fused, exact semantics (cutoff_top_n=40 is a no-op at C=33)
  - device LM-fused, cutoff_top_n=8 (the reference's per-frame class cut)
  - device lm=None, cutoff_top_n=8

Usage: python benchmarks/beam_throughput.py [--rows 128] [--frames 400]
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

LABELS = "_ abcdefghijklmnopqrstuvwxyzæøå'-"
FRAME_S = 0.02  # 20 ms acoustic frame hop


def synthetic_posteriors(rows: int, frames: int, num_classes: int, seed=0):
    """Blank-dominated peaky CTC posteriors shaped like a real model's."""
    rng = np.random.default_rng(seed)
    logits = rng.normal(0.0, 1.0, (rows, frames, num_classes)).astype(np.float32)
    logits[:, :, 0] += 2.5  # blank dominance
    # occasional confident char spikes
    spikes = rng.random((rows, frames)) < 0.25
    spike_cls = rng.integers(1, num_classes, (rows, frames))
    logits[np.arange(rows)[:, None], np.arange(frames)[None, :], spike_cls] += (
        spikes * 4.0
    )
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def synthetic_3gram(seed=0):
    from danspeech_tpu.decode.lm import NgramLM

    rng = np.random.default_rng(seed)
    words = [
        "hej", "med", "dig", "det", "er", "en", "test", "tak", "god", "dag",
        "jeg", "har", "ikke", "til", "og", "som", "kan", "skal", "vil", "den",
    ]
    lm = NgramLM(order=3)
    for w in words:
        lm.add_ngram((w,), -1.5 - rng.random(), -0.3)
    for _ in range(200):
        a, b = rng.choice(words, 2)
        lm.add_ngram((str(a), str(b)), -1.0 - rng.random(), -0.2)
    for _ in range(400):
        a, b, c = rng.choice(words, 3)
        lm.add_ngram((str(a), str(b), str(c)), -0.5 - rng.random())
    return lm


def time_decoder(dec, probs, sizes, iters: int) -> float:
    dec.decode(probs, sizes, n_best=1)  # warm/compile
    t0 = time.perf_counter()
    for _ in range(iters):
        dec.decode(probs, sizes, n_best=1)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=128)
    ap.add_argument("--frames", type=int, default=400)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--skip-host", action="store_true")
    args = ap.parse_args()

    from danspeech_tpu.decode.beam import BeamCTCDecoder
    from danspeech_tpu.decode.device_beam import DeviceBeamDecoder

    num_classes = len(LABELS)
    probs = synthetic_posteriors(args.rows, args.frames, num_classes)
    sizes = np.full(args.rows, args.frames, np.int32)
    audio_s = args.rows * args.frames * FRAME_S
    lm = synthetic_3gram()

    results = []

    def report(name, dt):
        rec = {"decoder": name, "audio_s_per_s": round(audio_s / dt, 1)}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    if not args.skip_host:
        # num_processes=6 = the engine default (engine.py BeamCTCDecoder
        # construction), which mirrors the reference's 6
        # (DanSpeechRecognizer.py:91). This box has os.cpu_count() cores —
        # recorded in the artifact so a 6-thread figure on a 2-core host
        # reads as what it is.
        host = BeamCTCDecoder(
            LABELS, lm_path=lm, alpha=1.3, beta=0.2, beam_width=64,
            num_processes=6,
        )
        host.decode(probs[:8], sizes[:8])  # warm
        t0 = time.perf_counter()
        host.decode(probs, sizes)
        report(
            f"host C++ (native/ctcbeam, 6 threads on {os.cpu_count()} cores)",
            time.perf_counter() - t0,
        )

    dprobs = jnp.asarray(probs)
    exact = DeviceBeamDecoder(
        LABELS, beam_width=64, lm=lm, alpha=1.3, beta=0.2, cutoff_top_n=40
    )
    report(
        "device LM-fused, exact semantics (cutoff_top_n=40 no-op), n_best=1",
        time_decoder(exact, dprobs, sizes, args.iters),
    )

    cut = DeviceBeamDecoder(
        LABELS, beam_width=64, lm=lm, alpha=1.3, beta=0.2, cutoff_top_n=8
    )
    report(
        "device LM-fused, cutoff_top_n=8, n_best=1",
        time_decoder(cut, dprobs, sizes, args.iters),
    )

    nolm = DeviceBeamDecoder(LABELS, beam_width=64, cutoff_top_n=8)
    report(
        "device lm=None, cutoff_top_n=8, n_best=1",
        time_decoder(nolm, dprobs, sizes, args.iters),
    )

    nolm_exact = DeviceBeamDecoder(LABELS, beam_width=64, cutoff_top_n=40)
    report(
        "device lm=None, exact semantics, n_best=1",
        time_decoder(nolm_exact, dprobs, sizes, args.iters),
    )

    out = {
        "setup": (
            f"T={args.frames} frames ({args.frames * FRAME_S:.0f} s audio/row), "
            f"C={num_classes}, beam 64, 3-gram LM, B={args.rows} rows, "
            "blank-dominated synthetic posteriors, TPU v5e 1 chip "
            "(r5, host beam at the engine's num_processes=6)"
        ),
        "rows": args.rows,
        "frames": args.frames,
        "iters": args.iters,
        "host_threads": 6,
        "host_cores": os.cpu_count(),
        "results": results,
        "notes": (
            "cutoff_top_n<C is the reference decoder's per-frame class cut "
            "moved on device; it changes transcripts like the reference's "
            "cut does. Default remains 40 (no-op at C=33) for exact parity. "
            "n_best=1 slices the beam arrays on device before the host "
            "fetch (what the engine uses for non-show_all calls)."
        ),
    }
    with open(os.path.join(REPO, "benchmarks", "beam_throughput.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
