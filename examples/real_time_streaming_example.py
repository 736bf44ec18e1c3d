"""Real-time chunked streaming with a uni-directional lookahead model.

TPU-native equivalent of
/root/reference/example_scripts/real_time_streaming_example.py: partial
transcriptions print as you speak (rolling conv+GRU state lives on the
device between chunks); when the utterance ends, a secondary bidirectional
model re-decodes the whole spectrogram for the final transcription.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse

from danspeech_tpu import Recognizer
from danspeech_tpu.audio import Microphone, SpeechFile
from danspeech_tpu.pretrained_models import CPUStreamingRNN, TestModel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wav", help="simulate the mic from a wav file")
    args = ap.parse_args()

    model = CPUStreamingRNN()
    recognizer = Recognizer(model=model)

    if args.wav:
        source = SpeechFile(filepath=args.wav)
    else:
        source = Microphone(sampling_rate=16000)
        with source:
            recognizer.adjust_for_ambient_noise(source, duration=2)

    recognizer.enable_real_time_streaming(
        streaming_model=model, string_parts=False, secondary_model=TestModel()
    )

    print("Speak! Partial transcriptions appear as you go. (Ctrl-C stops)")
    generator = recognizer.real_time_streaming(source)
    try:
        iterating_transcript = ""
        while True:
            is_last, transcription = next(generator)
            if is_last:
                print("\nFinal:", transcription)
                iterating_transcript = ""
                continue
            iterating_transcript = transcription
            print("\r" + iterating_transcript, end="", flush=True)
    except (KeyboardInterrupt, StopIteration):
        print("\nStopped.")


if __name__ == "__main__":
    main()
