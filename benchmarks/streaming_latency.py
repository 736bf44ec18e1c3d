"""Per-chunk streaming latency decomposition -> benchmarks/streaming_latency.json.

Config 4 (BASELINE streaming_chunked) reports audio-s/s but not WHERE the
per-chunk milliseconds go. This harness splits one chunk step of the
public engine path (engine.streaming_transcribe) into:

  parse_ms        host-side adaptive spectrogram (features/spectrogram.py)
  h2d_plus_rtt_ms chunk host->device transfer + one sync round trip
  device_ms       the jitted streaming step itself, amortized over a
                  dispatch train with ONE final fetch (axon dispatch cost
                  excluded by the amortization)
  rtt_ms          one device->host round trip of a 1-element fetch (the
                  tunnel latency floor paid once per chunk for results)
  fetch_extra_ms  fetching the full padded (1, T, C) probs block minus the
                  1-element RTT (pure payload cost over the tunnel)
  host_decode_ms  greedy argmax + collapse of the fetched chunk on host

Usage: python benchmarks/streaming_latency.py [--iters 20]
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


def build_streaming():
    from danspeech_tpu.models import DeepSpeechModel, deepspeech as ds
    from danspeech_tpu.models.config import DeepSpeechConfig

    cfg = DeepSpeechConfig(
        model_name="CPUStreamingRNN", rnn_hidden_size=800, rnn_layers=5,
        conv_layers=2, bidirectional=False, context=20, streaming_model=True,
    )
    return DeepSpeechModel(cfg, ds.cast_matmul_weights(ds.init_params(cfg, seed=0)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from danspeech_tpu.audio import load_audio_wavPCM
    from danspeech_tpu.engine import DanSpeechRecognizer

    model = build_streaming()
    eng = DanSpeechRecognizer(model_name=model)
    eng.enable_streaming(secondary_model=None, return_string_parts=False)

    wav = load_audio_wavPCM("/root/reference/example_files/u0013002.wav")
    chunk_samples = 16000
    chunks = [
        wav[i * chunk_samples : (i + 1) * chunk_samples]
        for i in range(len(wav) // chunk_samples)
    ]

    # ---- full public-path per-chunk wall time (the config-4 number) ------
    def run_stream():
        eng.reset_streaming_params()
        for ci, part in enumerate(chunks):
            eng.streaming_transcribe(
                part, is_last=(ci == len(chunks) - 1), is_first=(ci == 0)
            )

    run_stream()  # warm: compiles every (is_first, is_last) variant
    t0 = time.perf_counter()
    for _ in range(args.iters):
        run_stream()
    total_ms = (time.perf_counter() - t0) / (args.iters * len(chunks)) * 1e3

    # ---- pipelined mode (engine.enable_streaming(pipeline_depth=D)):
    # partials return D chunks late so result fetches overlap instead of
    # serializing one tunnel RTT per chunk; finals are identical
    piped_ms = {}
    for depth in (1, 2, 4):
        eng.enable_streaming(
            secondary_model=None, return_string_parts=False,
            pipeline_depth=depth,
        )
        run_stream()  # warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            run_stream()
        piped_ms[depth] = round(
            (time.perf_counter() - t0) / (args.iters * len(chunks)) * 1e3, 2
        )
    eng.enable_streaming(secondary_model=None, return_string_parts=False)

    # ---- stage decomposition on a steady-state chunk ---------------------
    from danspeech_tpu.engine import _bucket
    from danspeech_tpu.models import streaming

    eng.reset_streaming_params()
    eng.streaming_transcribe(chunks[0], is_last=False, is_first=True)
    eng.streaming_transcribe(chunks[1], is_last=False, is_first=False)
    part = chunks[2]

    # parse: host adaptive spectrogram
    t0 = time.perf_counter()
    for _ in range(args.iters):
        spect = eng.audio_parser.parse_audio(part, False)
    parse_ms = (time.perf_counter() - t0) / args.iters * 1e3

    spect = np.asarray(spect, dtype=np.float32)
    t_chunk = spect.shape[1]
    t_padded = _bucket(t_chunk + streaming.CHUNK_HEADROOM, eng.CHUNK_BUCKET)
    chunk_arr = np.zeros((1, 1, spect.shape[0], t_padded), np.float32)
    chunk_arr[0, 0, :, :t_chunk] = spect

    # h2d: host->device transfer of the padded chunk + one sync round trip
    # (the fetch that proves arrival costs a dispatch+fetch RTT of its own;
    # rtt_ms below is measured separately so the two can be disentangled)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        dev = jnp.asarray(chunk_arr)
        _ = float(np.asarray(dev[0, 0, 0, 0]))
    h2d_plus_rtt_ms = (time.perf_counter() - t0) / args.iters * 1e3

    # device: amortized step train with one tiny final fetch
    step = eng._stream_step_jit(False, False)
    state = eng._stream_state
    dev_chunk = jnp.asarray(chunk_arr)
    probs, out_len, st = step(eng._compute_params, dev_chunk, t_chunk, state)
    _ = float(np.asarray(out_len))  # force
    t0 = time.perf_counter()
    st = state
    for _ in range(args.iters):
        probs, out_len, st = step(eng._compute_params, dev_chunk, t_chunk, st)
    _ = float(np.asarray(out_len))
    device_ms = (time.perf_counter() - t0) / args.iters * 1e3

    # rtt: dispatch + 1-element fetch of a FRESH device scalar each time
    # (re-fetching the same committed array is cached client-side and
    # reads ~0 ms — not what a real per-chunk result fetch pays)
    t0 = time.perf_counter()
    for k in range(args.iters):
        _ = float(np.asarray(out_len + k))
    rtt_ms = (time.perf_counter() - t0) / args.iters * 1e3

    # fetch_extra: full padded probs block minus the rtt floor
    t0 = time.perf_counter()
    for _ in range(args.iters):
        p_host, ol = jax.device_get((probs, out_len))
    fetch_full_ms = (time.perf_counter() - t0) / args.iters * 1e3
    fetch_extra_ms = max(0.0, fetch_full_ms - rtt_ms)

    # host decode: greedy collapse of the valid slice
    p_valid = p_host[:, : int(ol)]
    t0 = time.perf_counter()
    for _ in range(args.iters):
        eng.greedy_decoder.decode(p_valid)
    host_decode_ms = (time.perf_counter() - t0) / args.iters * 1e3

    out = {
        "setup": (
            f"CPUStreamingRNN 5x800 uni, 1 s chunks ({t_chunk} spect frames, "
            f"padded {t_padded}), TPU v5e via axon tunnel, "
            f"iters={args.iters}"
        ),
        "total_per_chunk_ms": round(total_ms, 2),
        "pipelined_per_chunk_ms": {
            f"depth_{d}": v for d, v in piped_ms.items()
        },
        "stages_ms": {
            "parse": round(parse_ms, 2),
            "h2d_plus_rtt": round(h2d_plus_rtt_ms, 2),
            "device_step_amortized": round(device_ms, 2),
            "result_rtt": round(rtt_ms, 2),
            "fetch_probs_extra": round(fetch_extra_ms, 2),
            "host_greedy_decode": round(host_decode_ms, 2),
        },
        "notes": (
            "Stage timings UPPER-BOUND their share of the total: measured "
            "in isolation each pays a full serialized dispatch+fetch round "
            "trip over the axon tunnel, while the real per-chunk path "
            "pipelines upload, dispatch and fetch (total < sum of stages). "
            "The decomposition's value is ordinal: host parse and host "
            "greedy decode were 65 ms and 27 ms per chunk in round 2 "
            "(device STFT round trips / probs re-upload for argmax) and "
            "are now sub-ms; what remains of the total is tunnel round "
            "trips around a few-ms device step. pipeline_depth>0 "
            "(enable_streaming) overlaps the result fetch with the next "
            "chunk's dispatch and removes ~one RTT per chunk, but "
            "plateaus at depth 1-2: the stdio relay serializes concurrent "
            "fetches, so the remaining per-chunk cost IS one relay round "
            "trip — on a locally-attached TPU the same path is "
            "device-bound (~4 ms/chunk)."
        ),
    }
    print(json.dumps(out, indent=2))
    with open(os.path.join(REPO, "benchmarks", "streaming_latency.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
