"""Engine streaming end-states: secondary-model rescore and LM final
re-decode (reference DanSpeechRecognizer.py:186-208).

The per-chunk greedy partial path is covered by test_streaming_masked /
test_streaming_parity; these pin the two final-chunk behaviors.
"""

import numpy as np
import pytest

from danspeech_tpu.engine import DanSpeechRecognizer
from danspeech_tpu.features.spectrogram import InferenceSpectrogramAudioParser
from danspeech_tpu.models import DeepSpeechModel, deepspeech as ds
from danspeech_tpu.models.config import DeepSpeechConfig

from test_model_parity import randomize_bn


@pytest.fixture(scope="module")
def stream_model():
    """Uni+lookahead streaming model, fc sharpened so greedy partials are
    non-empty (the engine's final-chunk rescore only fires when the
    iterating transcript has content — reference :185)."""
    cfg = DeepSpeechConfig(
        model_name="stream",
        rnn_hidden_size=64,
        rnn_layers=2,
        conv_layers=2,
        bidirectional=False,
        context=20,
    )
    m = DeepSpeechModel.init_random(cfg, seed=11)
    m.params = randomize_bn(m.params, seed=12)
    fc = m.params["fc"]
    m.params = {**m.params, "fc": fc._replace(weight=fc.weight * 4.0)}
    return m


@pytest.fixture(scope="module")
def secondary_model():
    cfg = DeepSpeechConfig(
        model_name="secondary", rnn_hidden_size=64, rnn_layers=2, conv_layers=2
    )
    m = DeepSpeechModel.init_random(cfg, seed=5)
    m.params = randomize_bn(m.params, seed=6)
    return m


def _chunks(rng, n=4, size=15200):
    return [rng.normal(size=size).astype(np.float32) * 600 for _ in range(n)]


def test_secondary_model_rescore_matches_direct(stream_model, secondary_model):
    """On the final chunk the secondary (bidirectional) model re-transcribes
    the concatenated streaming spectrograms; the result must equal running
    that model + greedy decode on the same spectrogram directly."""
    rng = np.random.default_rng(0)
    chunks = _chunks(rng)

    eng = DanSpeechRecognizer()
    eng.update_model(stream_model)
    eng.enable_streaming(secondary_model=secondary_model, return_string_parts=False)
    final = ""
    for i, ch in enumerate(chunks):
        out = eng.streaming_transcribe(
            ch, is_last=(i == len(chunks) - 1), is_first=(i == 0)
        )
        if i == len(chunks) - 1:
            final = out

    # reference computation: same parser over the same chunks, concat,
    # secondary forward, greedy decode
    parser = InferenceSpectrogramAudioParser(
        audio_config=stream_model.audio_conf
    )
    spects = []
    for i, ch in enumerate(chunks):
        s = parser.parse_audio(ch, i == len(chunks) - 1)
        if len(s):
            spects.append(np.asarray(s))
    full = np.concatenate(spects, axis=1)

    import jax.numpy as jnp

    probs, lens = ds.forward(
        secondary_model.params,
        secondary_model.config,
        jnp.asarray(full)[None, None],
        jnp.asarray([full.shape[1]]),
    )
    from danspeech_tpu.decode.greedy import GreedyDecoder

    dec = GreedyDecoder(labels=secondary_model.labels, blank_index=0)
    expected, _ = dec.decode(np.asarray(probs), np.asarray(lens))
    assert final == expected[0][0]
    assert len(final) > 0


class RecordingDecoder:
    def __init__(self):
        self.calls = []

    def decode(self, probs, sizes=None):
        probs = np.asarray(probs)
        self.calls.append(probs.shape)
        return [["final-redecode"]], [[np.zeros(0, np.int32)]]


def test_lm_final_redecode_consumes_concatenated_probs(stream_model):
    """With an LM decoder and no secondary model, the final chunk re-decodes
    the concatenated per-chunk probability stream through the beam decoder
    (reference :203-208)."""
    rng = np.random.default_rng(1)
    chunks = _chunks(rng)

    eng = DanSpeechRecognizer()
    eng.update_model(stream_model)
    eng.enable_streaming(secondary_model=None, return_string_parts=False)
    eng.lm = "not-greedy"  # engine treats any non-greedy value as LM mode
    rec = RecordingDecoder()
    eng.decoder = rec

    outputs = []
    for i, ch in enumerate(chunks):
        outputs.append(
            eng.streaming_transcribe(
                ch, is_last=(i == len(chunks) - 1), is_first=(i == 0)
            )
        )

    assert outputs[-1] == "final-redecode"
    assert len(rec.calls) == 1  # one final re-decode over the whole stream
    batch, t_total, n_classes = rec.calls[0]
    assert batch == 1 and n_classes == len(stream_model.labels)
    # the concatenated stream covers every emitted chunk's frames: more
    # frames than any single chunk could produce
    assert t_total > 40


def _run_stream(eng, chunks, **enable_kwargs):
    eng.enable_streaming(**enable_kwargs)
    outs = []
    for i, ch in enumerate(chunks):
        outs.append(
            eng.streaming_transcribe(
                ch, is_last=(i == len(chunks) - 1), is_first=(i == 0)
            )
        )
    return outs


def test_pipelined_streaming_matches_sync(stream_model):
    """pipeline_depth=D must produce the same final transcript and the
    same cumulative partials, shifted D chunks later (engine.
    enable_streaming pipelined mode)."""
    rng = np.random.default_rng(3)
    chunks = _chunks(rng, n=6)
    eng = DanSpeechRecognizer(model_name=stream_model)

    sync = _run_stream(eng, chunks, return_string_parts=False)
    assert sync[-1]  # final transcript non-empty

    for depth in (1, 2):
        piped = _run_stream(
            eng, chunks, return_string_parts=False, pipeline_depth=depth
        )
        assert piped[-1] == sync[-1]
        # chunk 0 primes the convs (returns "") in both modes; partials
        # for chunks 1..n-2 arrive `depth` later, the final drains all
        assert piped[1 : 1 + depth] == [""] * depth
        assert piped[1 + depth : -1] == sync[1 : -1 - depth]


def test_pipelined_streaming_final_with_lm(stream_model):
    """The pipelined drain must hand the LM final re-decode the identical
    concatenated probs stream as sync mode."""
    rng = np.random.default_rng(4)
    chunks = _chunks(rng, n=5)

    streams = []
    for depth in (0, 2):
        eng = DanSpeechRecognizer(model_name=stream_model)
        eng.enable_streaming(return_string_parts=False, pipeline_depth=depth)
        eng.lm = "not-greedy"
        rec = RecordingDecoder()
        eng.decoder = rec
        for i, ch in enumerate(chunks):
            out = eng.streaming_transcribe(
                ch, is_last=(i == len(chunks) - 1), is_first=(i == 0)
            )
        assert out == "final-redecode"
        assert len(rec.calls) == 1
        streams.append(rec.calls[0])
    assert streams[0] == streams[1]  # same (B, T_total, C) stream shape


def test_pipelined_drain_on_frameless_final_chunk(stream_model):
    """A final chunk shorter than n_fft (the normal end-of-mic flush)
    produces no frames — the pipelined queue must still drain so the
    final transcript matches sync mode (code-review r4 finding #1)."""
    rng = np.random.default_rng(9)
    chunks = _chunks(rng, n=5) + [rng.normal(size=100).astype(np.float32)]

    eng = DanSpeechRecognizer(model_name=stream_model)
    sync = _run_stream(eng, chunks, return_string_parts=False)
    piped = _run_stream(
        eng, chunks, return_string_parts=False, pipeline_depth=2
    )
    assert piped[-1] == sync[-1]
    # before the final flush the pipelined partials lag by depth chunks;
    # the drain on the frameless final chunk is what catches them up
    assert len(piped[-2]) < len(piped[-1])
