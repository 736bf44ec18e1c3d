"""Cohort-batched multi-stream serving.

Beyond the reference's surface (its streaming path is batch-1,
/root/reference/danspeech/DanSpeechRecognizer.py:154): one TPU chip serves
S concurrent real-time sessions by stepping them together through a single
jitted chunk step whose batch dimension is the stream index. This script
simulates S sessions from the reference example files and prints each
stream's rolling transcript.

Usage: python examples/multi_stream_server.py [--streams 8] [--chunk-ms 1000]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from danspeech_tpu import MultiStreamTranscriber
from danspeech_tpu.audio import load_audio_wavPCM
from danspeech_tpu.models import DeepSpeechModel, deepspeech as ds
from danspeech_tpu.models.config import DeepSpeechConfig

EXAMPLES = "/root/reference/example_files/*.wav"


def demo_stream_model():
    """CPUStreamingRNN-shaped model with random weights (the real zoo
    checkpoint needs network access)."""
    cfg = DeepSpeechConfig(
        model_name="CPUStreamingRNN", rnn_hidden_size=800, rnn_layers=5,
        conv_layers=2, bidirectional=False, context=20, streaming_model=True,
    )
    return DeepSpeechModel(cfg, ds.cast_matmul_weights(ds.init_params(cfg, seed=0)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--chunk-ms", type=int, default=1000)
    args = ap.parse_args()

    chunk = 16 * args.chunk_ms  # samples at 16 kHz
    waves = [load_audio_wavPCM(p) for p in sorted(glob.glob(EXAMPLES))]
    buf = np.concatenate(waves)
    n_chunks = 5
    streams = [
        buf[(s * 16000) % (len(buf) - n_chunks * chunk):][: n_chunks * chunk]
        for s in range(args.streams)
    ]

    ms = MultiStreamTranscriber(demo_stream_model(), n_streams=args.streams)
    for ci in range(n_chunks):
        cohort = [st[ci * chunk : (ci + 1) * chunk] for st in streams]
        outs = ms.step(cohort, is_first=(ci == 0), is_last=(ci == n_chunks - 1))
        print(f"--- chunk {ci + 1}/{n_chunks} ---")
        for s, text in enumerate(outs):
            tag = "final" if ci == n_chunks - 1 else "part"
            print(f"  stream {s:2d} [{tag}]: {text!r}")


if __name__ == "__main__":
    main()
