"""End-to-end Recognizer tests on the reference example WAVs.

Uses a randomly-initialized TestModel-shaped model (2 conv, small GRU) —
pretrained weights are not downloadable in this environment, so correctness
is established by comparing the *whole pipeline* (load -> STFT -> model ->
greedy decode) against a torch replica of the reference stack on the same
weights.
"""

import numpy as np
import pytest
import torch

from danspeech_tpu import Recognizer
from danspeech_tpu.audio import load_audio
from danspeech_tpu.models import DeepSpeechModel
from danspeech_tpu.models.config import DeepSpeechConfig

from test_model_parity import randomize_bn, torch_forward
from test_stft import numpy_librosa_stft


@pytest.fixture(scope="module")
def small_model():
    config = DeepSpeechConfig(
        model_name="e2e-test", rnn_hidden_size=96, rnn_layers=2, conv_layers=2
    )
    model = DeepSpeechModel.init_random(config, seed=11)
    model.params = randomize_bn(model.params, seed=12)
    return model


def reference_pipeline(model, waveform):
    """Torch replica of recognize(): parser + forward + greedy decode."""
    spect = np.log1p(numpy_librosa_stft(waveform)).astype(np.float32)
    spect = (spect - spect.mean()) / spect.std(ddof=1)
    x = spect[None, None]
    probs, lens = torch_forward(model.params, model.config, x, [x.shape[3]])
    path = probs[0, : lens[0]].argmax(axis=-1)
    labels = model.config.labels
    out = []
    for i, k in enumerate(path):
        ch = labels[k]
        if ch != "_" and not (i and k == path[i - 1]):
            out.append(ch)
    return "".join(out)


def test_recognize_matches_torch_pipeline(small_model, example_wav):
    waveform = load_audio(example_wav)[:48000]
    recognizer = Recognizer(model=small_model)
    ours = recognizer.recognize(waveform)
    ref = reference_pipeline(small_model, waveform)
    assert ours == ref


def test_recognize_batch(small_model, example_wavs):
    waveforms = [load_audio(p)[:32000] for p in example_wavs[:4]]
    recognizer = Recognizer(model=small_model)
    batch_out = recognizer.recognize_batch(waveforms)
    singles = [recognizer.recognize(w) for w in waveforms]
    assert batch_out == singles


def test_show_all_greedy_warns(small_model, example_wav):
    waveform = load_audio(example_wav)[:32000]
    recognizer = Recognizer(model=small_model)
    with pytest.warns(Warning):
        all_out = recognizer.recognize(waveform, show_all=True)
    assert isinstance(all_out, list)


def test_model_swap(small_model, example_wav):
    waveform = load_audio(example_wav)[:32000]
    recognizer = Recognizer(model=small_model)
    first = recognizer.recognize(waveform)

    other = DeepSpeechModel.init_random(small_model.config, seed=99)
    recognizer.update_model(other)
    second = recognizer.recognize(waveform)
    # different weights ought to give a different greedy string
    recognizer.update_model(small_model)
    assert recognizer.recognize(waveform) == first
    del second
