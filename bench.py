"""Benchmark: batch greedy decode throughput on the real TPU chip.

Measures audio-seconds of speech processed per wall-second per chip for the
full pipeline (waveform -> STFT log-spectrogram -> DanSpeechPrimary-shaped
acoustic model -> greedy CTC decode) over the 13 reference example
utterances (76.19 s of audio), batched data-parallel on one chip.

Baseline: the same computation in torch on CPU (the reference runs
CPU/CUDA torch; this environment has no CUDA), measured once and cached in
benchmarks/baseline_cpu.json.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "audio-s/s/chip", "vs_baseline": N}
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
EXAMPLES = "/root/reference/example_files/*.wav"
BASELINE_CACHE = os.path.join(REPO, "benchmarks", "baseline_cpu.json")

FLAGSHIP = dict(
    model_name="DanSpeechPrimary", rnn_hidden_size=1200, rnn_layers=9,
    conv_layers=3, bidirectional=True,
)


def load_waveforms():
    from danspeech_tpu.audio import load_audio_wavPCM

    paths = sorted(glob.glob(EXAMPLES))
    waves = [load_audio_wavPCM(p) for p in paths]
    total_audio_s = sum(len(w) for w in waves) / 16000.0
    return waves, total_audio_s


# Serving batch: fill the MXU's 128-lane row tile exactly. The GRU per-step
# matmul pads M up to 128 regardless, so every row below 128 is paid-for
# silicon doing nothing — cycle the 13 files to occupy all 128 rows.
BATCH_ROWS = int(os.environ.get("BENCH_BATCH_ROWS", "128"))

# Length-bucketed batching (the DP serving plan, SURVEY §2.5): padding every
# row to the global max wastes 26 % of the batch on the reference clips
# (2.98-7.98 s). Group clips by ceil(len / bucket) and run one full
# BATCH_ROWS dispatch per bucket — shapes stay bounded (one compile per
# 1 s bucket), M stays 128, padding waste drops to ~7 %.
BUCKET_SAMPLES = int(float(os.environ.get("BENCH_BUCKET_SECONDS", "1")) * 16000)


def bench_tpu(waves, iters: int = 10):
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from danspeech_tpu.features.spectrogram import SpectrogramAudioParser
    from danspeech_tpu.models import deepspeech as ds
    from danspeech_tpu.models.config import DeepSpeechConfig
    from danspeech_tpu.ops import stft as stft_ops

    config = DeepSpeechConfig(**FLAGSHIP)
    # Serving init path: materialize the checkpoint on disk and load it
    # back through the importer, so the bench exercises the same
    # checkpoint -> pytree -> bf16-cast pipeline a real deployment runs
    # (not just in-memory random params).
    import tempfile

    from danspeech_tpu.models.checkpoint import load_checkpoint, save_checkpoint

    with tempfile.TemporaryDirectory(dir="/tmp") as td:
        ckpt = os.path.join(td, "flagship.dsz")
        save_checkpoint(ckpt, config, ds.init_params(config, seed=0))
        config, params = load_checkpoint(ckpt)
    params = ds.cast_matmul_weights(params)
    parser = SpectrogramAudioParser(config.audio_conf)

    # Group clips into length buckets; each bucket runs as its own full
    # BATCH_ROWS dispatch (cycling the bucket's clips), so the padded
    # length of every dispatch is its own bucket boundary.
    buckets: dict[int, list[np.ndarray]] = {}
    for w in waves:
        b = -(-len(w) // BUCKET_SAMPLES) * BUCKET_SAMPLES
        buckets.setdefault(b, []).append(w)

    @jax.jit
    def run(params, waveforms, lens):
        spect, frame_lens = stft_ops.batched_log_spectrogram(
            waveforms, lens, parser.n_fft, parser.hop_length, parser.window
        )
        probs, out_lens = ds.forward(params, config, spect[:, None, :, :], frame_lens)
        # argmax on device: only the (B, T) paths come back to host
        return jnp.argmax(probs, axis=-1), out_lens

    groups = []  # (jbatch, jlens, audio_s per dispatch)
    for maxlen in sorted(buckets):
        rows = [buckets[maxlen][i % len(buckets[maxlen])] for i in range(BATCH_ROWS)]
        lengths = np.array([len(w) for w in rows], dtype=np.int32)
        batch = np.zeros((BATCH_ROWS, maxlen), dtype=np.float32)
        for i, w in enumerate(rows):
            batch[i, : len(w)] = w
        groups.append(
            (jnp.asarray(batch), jnp.asarray(lengths), float(lengths.sum()) / 16000.0)
        )

    # warmup / compile every bucket shape
    for jb, jl, _ in groups:
        paths, out_lens = run(params, jb, jl)
        _ = np.asarray(paths)

    # Amortized timing: enqueue all iterations, fetch once. The axon tunnel
    # has a ~30 ms dispatch+fetch round-trip that is not device time (a real
    # serving host overlaps it); TPU executes enqueued programs in order,
    # so total wall / iters is true steady-state per-batch latency.
    fetched = []
    t0 = time.perf_counter()
    for _ in range(iters):
        fetched = [run(params, jb, jl) for jb, jl, _ in groups]
    fetched_np = [(np.asarray(p), np.asarray(ol)) for p, ol in fetched]
    elapsed = (time.perf_counter() - t0) / iters

    # decode once (host-side collapse cost is part of the pipeline)
    t0 = time.perf_counter()
    from danspeech_tpu.decode.greedy import collapse_sequence

    for paths_np, out_lens_np in fetched_np:
        for b in range(paths_np.shape[0]):
            collapse_sequence(paths_np[b], int(out_lens_np[b]), config.labels, 0)
    decode_s = time.perf_counter() - t0

    batch_audio_s = sum(a for _, _, a in groups)
    return elapsed + decode_s, batch_audio_s


def bench_cpu_baseline(waves) -> float:
    """Reference-stack throughput: torch CPU, utterance at a time (batch=1,
    like DanSpeechRecognizer.py:220). Cached across runs."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["audio_s_per_s"]

    import torch
    import torch.nn.functional as F

    torch.manual_seed(0)
    h, layers = FLAGSHIP["rnn_hidden_size"], FLAGSHIP["rnn_layers"]

    convs = torch.nn.Sequential(
        torch.nn.Conv2d(1, 32, (41, 11), (2, 2), (20, 5)),
        torch.nn.BatchNorm2d(32),
        torch.nn.Hardtanh(0, 20),
        torch.nn.Conv2d(32, 32, (21, 11), (2, 1), (10, 5)),
        torch.nn.BatchNorm2d(32),
        torch.nn.Hardtanh(0, 20),
        torch.nn.Conv2d(32, 96, (21, 11), (2, 1), (10, 5)),
        torch.nn.BatchNorm2d(96),
        torch.nn.Hardtanh(0, 20),
    ).eval()
    rnns = [
        torch.nn.GRU(2016 if k == 0 else h, h, bidirectional=True).eval()
        for k in range(layers)
    ]
    bns = [torch.nn.BatchNorm1d(h).eval() for _ in range(layers - 1)]
    fc_bn = torch.nn.BatchNorm1d(h).eval()
    fc = torch.nn.Linear(h, 33, bias=False).eval()

    # torch STFT featurizer (same config as the reference parser)
    win = torch.hamming_window(320, periodic=False, dtype=torch.float32)

    def one_utt(w):
        x = torch.tensor(w, dtype=torch.float32)
        d = torch.stft(x, 320, 160, 320, win, center=True, pad_mode="reflect",
                       return_complex=True)
        spect = torch.log1p(d.abs())
        spect = (spect - spect.mean()) / spect.std()
        x = spect[None, None]
        with torch.no_grad():
            x = convs(x)
            n, c, f, t = x.shape
            x = x.view(n, c * f, t).transpose(1, 2).transpose(0, 1)
            for k, rnn in enumerate(rnns):
                if k > 0:
                    tt, nn_ = x.shape[0], x.shape[1]
                    x = bns[k - 1](x.reshape(tt * nn_, -1)).view(tt, nn_, -1)
                x, _ = rnn(x)
                x = x.view(x.size(0), x.size(1), 2, -1).sum(2)
            tt, nn_ = x.shape[0], x.shape[1]
            x = fc(fc_bn(x.reshape(tt * nn_, -1))).view(tt, nn_, -1)
            probs = F.softmax(x, dim=-1)
            probs.argmax(-1)

    # measure on the first two utterances, extrapolate by audio length
    sample = waves[:2]
    t0 = time.perf_counter()
    for w in sample:
        one_utt(w)
    elapsed = time.perf_counter() - t0
    audio_s = sum(len(w) for w in sample) / 16000.0
    rate = audio_s / elapsed

    os.makedirs(os.path.dirname(BASELINE_CACHE), exist_ok=True)
    with open(BASELINE_CACHE, "w") as f:
        json.dump(
            {
                "audio_s_per_s": rate,
                "note": "torch CPU, DanSpeechPrimary shape, batch=1 per reference",
                "machine": os.uname().nodename,
            },
            f,
            indent=2,
        )
    return rate


def main():
    waves, total_audio_s = load_waveforms()
    del total_audio_s  # throughput counts the actual batched rows

    elapsed, batch_audio_s = bench_tpu(waves)
    tpu_rate = batch_audio_s / elapsed

    try:
        cpu_rate = bench_cpu_baseline(waves)
    except Exception as e:  # baseline failure should not kill the bench
        print(f"baseline measurement failed: {e}", file=sys.stderr)
        cpu_rate = None

    result = {
        "metric": "batch_greedy_decode_throughput",
        "value": round(tpu_rate, 2),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(tpu_rate / cpu_rate, 2) if cpu_rate else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
