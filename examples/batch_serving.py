"""High-throughput batch serving with the int16 fast path.

Beyond-reference gallery script: the reference transcribes one utterance
at a time on the host stack (DanSpeechRecognizer.py:218-231); here the
same public surface runs the bucketed async scheduler — length-bucketed
128-row dispatch groups, pinned int16 staging buffers, device argmax,
vectorized host collapse overlapped with device execution
(engine.py:_transcribe_pipelined) — and, opt-in, pipelined low-latency
streaming partials.

Run:  python examples/batch_serving.py [--wav-dir DIR]
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from danspeech_tpu import Recognizer
from danspeech_tpu.audio import load_audio_pcm16
from danspeech_tpu.models import DeepSpeechModel
from danspeech_tpu.models.config import DeepSpeechConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--wav-dir", default="/root/reference/example_files",
        help="directory of 16 kHz PCM wavs",
    )
    args = ap.parse_args()

    # demo model (random weights — swap in DanSpeechPrimary() with network)
    cfg = DeepSpeechConfig(
        model_name="demo", rnn_hidden_size=400, rnn_layers=5, conv_layers=2
    )
    recognizer = Recognizer(model=DeepSpeechModel.init_random(cfg, seed=0))

    # int16 loader: half the host->device bytes of the float path; the
    # engine stages int16 verbatim and casts on device
    waves = [
        load_audio_pcm16(p)
        for p in sorted(glob.glob(os.path.join(args.wav_dir, "*.wav")))
    ]
    print(f"{len(waves)} clips, {sum(len(w) for w in waves)/16000:.1f} s audio")

    out = recognizer.recognize_batch(waves)  # warm-up + compile
    t0 = time.perf_counter()
    out = recognizer.recognize_batch(waves)
    dt = time.perf_counter() - t0
    rate = sum(len(w) for w in waves) / 16000 / dt
    for path, text in zip(sorted(glob.glob(os.path.join(args.wav_dir, "*.wav"))), out):
        print(f"  {os.path.basename(path)}: {text[:60]}")
    print(f"batch decode: {dt*1e3:.0f} ms -> {rate:,.0f} audio-s/s")


if __name__ == "__main__":
    main()
