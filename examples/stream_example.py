"""Microphone streaming with silence segmentation.

TPU-native equivalent of /root/reference/example_scripts/stream_example.py:
opens the microphone, calibrates the energy VAD, then yields one
transcription per detected utterance from ``Recognizer.streaming``.

Requires a capture device; pass --wav to simulate the stream from a file
source instead (useful on headless hosts).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse

from danspeech_tpu import Recognizer
from danspeech_tpu.audio import Microphone, SpeechFile
from danspeech_tpu.pretrained_models import TestModel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wav", help="simulate the mic from a wav file")
    args = ap.parse_args()

    recognizer = Recognizer(model=TestModel())

    if args.wav:
        source = SpeechFile(filepath=args.wav)
    else:
        source = Microphone(sampling_rate=16000)
        with source:
            print("Calibrating ambient noise threshold...")
            recognizer.adjust_for_ambient_noise(source, duration=2)

    print("Speak! (Ctrl-C to stop)")
    generator = recognizer.streaming(source)
    try:
        for transcription in generator:
            print("Transcription:", transcription)
    except KeyboardInterrupt:
        print("Stopped.")


if __name__ == "__main__":
    main()
