"""Long-form offline transcription with energy-based VAD segmentation.

TPU-native equivalent of
/root/reference/example_scripts/video_transcribe_simulation.py: walks a
long recording in 1024-sample steps, segments on energy (hand-rolled
start/pause counters like the reference :100-143), and transcribes each
detected utterance. Segments are queued and flushed through
``recognize_batch`` so the device sees large data-parallel batches instead
of the reference's one-at-a-time calls.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse


from danspeech_tpu import Recognizer
from danspeech_tpu.audio import load_audio
from danspeech_tpu.pretrained_models import Folketinget, TestModel
from danspeech_tpu.language_models import Folketinget3gram

STEP = 1024


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("audio", help="path to the long recording")
    ap.add_argument("--offset-seconds", type=float, default=0.0)
    ap.add_argument("--energy-threshold", type=float, default=700.0)
    ap.add_argument("--test-model", action="store_true",
                    help="use the small TestModel instead of Folketinget")
    ap.add_argument("--batch", type=int, default=16,
                    help="utterance segments per device batch")
    args = ap.parse_args()

    if args.test_model:
        recognizer = Recognizer(model=TestModel())
    else:
        # reference's tuned long-form config (:68-69)
        recognizer = Recognizer(
            model=Folketinget(), lm=Folketinget3gram(),
            alpha=1.0471119809697471, beta=2.8309374387487924, beam_width=64,
        )

    audio = load_audio(args.audio)
    audio = audio[int(args.offset_seconds * 16000):]

    # energy-endpointed utterance ranges (reference loop :100-143), then
    # flush through the device in data-parallel batches
    from danspeech_tpu.audio.dsp import energy_vad_segments

    ranges = energy_vad_segments(
        audio, step=STEP, energy_threshold=args.energy_threshold,
        max_pause_steps=12, min_segment_samples=16000,
    )
    segments = []
    for i in range(0, len(ranges), args.batch):
        pending = [audio[a:b] for a, b in ranges[i : i + args.batch]]
        segments.extend(recognizer.recognize_batch(pending))

    for i, text in enumerate(segments):
        print(f"[{i:4d}] {text}")


if __name__ == "__main__":
    main()
