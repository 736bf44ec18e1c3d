"""One-shot file transcription: greedy vs LM beam vs all beams.

TPU-native equivalent of the reference gallery script
(/root/reference/example_scripts/execute_recognize.py). Loads an example
utterance, transcribes greedily, then (when an LM is available) with the
KenLM-fused beam decoder, and finally shows every surviving beam.

Run:  python examples/run_recognize.py [--wav PATH] [--random-weights]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import os

from danspeech_tpu import Recognizer
from danspeech_tpu.audio import load_audio

DEFAULT_WAV = "/root/reference/example_files/u0013002.wav"


def get_model(random_weights: bool):
    if random_weights:
        # offline fallback: TestModel-shaped, random weights (gibberish out,
        # but the whole pipeline runs)
        from danspeech_tpu.models import DeepSpeechModel
        from danspeech_tpu.models.config import DeepSpeechConfig

        config = DeepSpeechConfig(
            model_name="TestModel-random", rnn_hidden_size=400, rnn_layers=5,
            conv_layers=2,
        )
        return DeepSpeechModel.init_random(config, seed=0)
    from danspeech_tpu.pretrained_models import TestModel

    return TestModel()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wav", default=DEFAULT_WAV)
    ap.add_argument(
        "--random-weights", action="store_true",
        help="skip the model download (offline environments)",
    )
    args = ap.parse_args()

    recognizer = Recognizer(model=get_model(args.random_weights))
    audio = load_audio(args.wav)

    print("Greedy transcription:")
    print(" ", recognizer.recognize(audio))

    try:
        from danspeech_tpu.language_models import DSL3gram

        recognizer.update_decoder(lm=DSL3gram())
        print("LM beam-search transcription:")
        print(" ", recognizer.recognize(audio, show_all=False))

        print("All beams:")
        for beam in recognizer.recognize(audio, show_all=True):
            print(" ", beam)
    except Exception as e:  # no network / LM unavailable
        print(f"(beam decoding skipped: {e})")


if __name__ == "__main__":
    main()
