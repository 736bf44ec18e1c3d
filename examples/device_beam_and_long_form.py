"""On-device LM beam search + mesh-sharded decoding + long-form audio.

Beyond-reference gallery script: the reference decodes on the host through
the ctcdecode C++ extension (decoder.py:96-144) and VAD-segments long
audio on the host (video_transcribe_simulation.py:100-143); here the same
public Recognizer surface reaches

- ``backend="device"``  — beam search + LM fusion jitted on the chip
  (HBM-resident n-gram tables, decode/device_lm.py),
- ``backend="sharded"`` — the beam front sharded over a device mesh with
  all_gather pruning (decode/dist_beam.py),
- ``recognize_long_form`` — one utterance's time axis sharded over the
  mesh (parallel/time_shard.py).

Run:  python examples/device_beam_and_long_form.py [--wav PATH]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np

from danspeech_tpu import Recognizer
from danspeech_tpu.audio import load_audio
from danspeech_tpu.decode.lm import NgramLM
from danspeech_tpu.models import DeepSpeechModel
from danspeech_tpu.models.config import DeepSpeechConfig
from danspeech_tpu.parallel.mesh import make_mesh

DEFAULT_WAV = "/root/reference/example_files/u0013002.wav"


def demo_lm() -> NgramLM:
    """Tiny synthetic bigram LM (stands in for the zoo's DSL3gram when no
    network is available)."""
    rng = np.random.default_rng(0)
    words = ["hej", "med", "dig", "tak", "og", "det", "er", "nu"]
    lm = NgramLM(2)
    for w in words:
        lm.add_ngram((w,), float(rng.uniform(-2, -0.3)), float(rng.uniform(-0.5, 0)))
    for _ in range(20):
        pair = tuple(words[i] for i in rng.integers(0, len(words), 2))
        if pair not in lm.tables[1]:
            lm.add_ngram(pair, float(rng.uniform(-1.5, -0.1)))
    return lm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wav", default=DEFAULT_WAV)
    args = ap.parse_args()

    config = DeepSpeechConfig(
        model_name="demo", rnn_hidden_size=96, rnn_layers=2, conv_layers=2
    )
    model = DeepSpeechModel.init_random(config, seed=3)
    waveform = load_audio(args.wav)

    recognizer = Recognizer(model=model, lm=demo_lm(), alpha=1.0, beta=0.3)
    recognizer.update_decoder(beam_width=16)

    print("host C++ beam:    ", recognizer.recognize(waveform))

    recognizer.update_decoder(backend="device")
    print("on-device LM beam:", recognizer.recognize(waveform))

    mesh = make_mesh()
    recognizer.update_decoder(backend="sharded", mesh=mesh)
    print("mesh-sharded beam:", recognizer.recognize(waveform))

    # long-form: time axis sharded over the mesh (greedy decode)
    long_audio = np.concatenate([waveform] * 4)
    greedy = Recognizer(model=model)
    print("long-form (greedy):", greedy.recognize_long_form(long_audio, mesh=mesh)[:80])


if __name__ == "__main__":
    main()
