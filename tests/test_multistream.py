"""Cohort-batched streaming == S independent single-stream engines.

MultiStreamTranscriber steps S sessions through one jitted chunk step with
the stream index as the batch dimension; every per-stream behavior
(adaptive normalization, greedy partials, join hack, LM final re-decode)
must match running each stream alone through DanSpeechRecognizer's
streaming state machine (reference DanSpeechRecognizer.py:144-216).
"""

import numpy as np
import pytest

from danspeech_tpu.engine import DanSpeechRecognizer
from danspeech_tpu.multistream import MultiStreamTranscriber
from danspeech_tpu.models import DeepSpeechModel
from danspeech_tpu.models.config import DeepSpeechConfig

from test_model_parity import randomize_bn


@pytest.fixture(scope="module")
def stream_model():
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


def _stream_audio(rng, n_chunks=4, size=15200):
    return [rng.normal(size=size).astype(np.float32) * 600 for _ in range(n_chunks)]


def _run_single(model, chunks):
    """One stream through the reference-shaped engine state machine."""
    eng = DanSpeechRecognizer(model_name=model)
    eng.enable_streaming(secondary_model=None, return_string_parts=True)
    parts, final = [], None
    for ci, ch in enumerate(chunks):
        out = eng.streaming_transcribe(
            ch, is_last=(ci == len(chunks) - 1), is_first=(ci == 0)
        )
        if ci == len(chunks) - 1:
            final = out
        else:
            parts.append(out)
    return parts, final


def test_cohort_matches_independent_streams(stream_model):
    n_streams, n_chunks = 3, 4
    streams = [_stream_audio(np.random.default_rng(7 + s), n_chunks)
               for s in range(n_streams)]

    singles = [_run_single(stream_model, streams[s]) for s in range(n_streams)]

    ms = MultiStreamTranscriber(stream_model, n_streams=n_streams)
    got_parts = [[] for _ in range(n_streams)]
    got_final = None
    for ci in range(n_chunks):
        cohort = [streams[s][ci] for s in range(n_streams)]
        out = ms.step(cohort, is_last=(ci == n_chunks - 1), is_first=(ci == 0))
        if ci == n_chunks - 1:
            got_final = out
        else:
            for s in range(n_streams):
                got_parts[s].append(out[s])

    for s in range(n_streams):
        exp_parts, exp_final = singles[s]
        assert got_parts[s] == exp_parts
        assert got_final[s] == exp_final
    # streams carry different audio -> transcripts should differ
    assert len(set(got_final)) > 1 or all(f == "" for f in got_final)


def test_epoch_resets_for_next_cohort(stream_model):
    """After is_last the cohort state resets: replaying the same streams
    reproduces the same finals."""
    n_chunks = 3
    streams = [_stream_audio(np.random.default_rng(20 + s), n_chunks)
               for s in range(2)]

    ms = MultiStreamTranscriber(stream_model, n_streams=2)

    def run_epoch():
        out = None
        for ci in range(n_chunks):
            out = ms.step(
                [streams[s][ci] for s in range(2)],
                is_last=(ci == n_chunks - 1),
                is_first=(ci == 0),
            )
        return out

    assert run_epoch() == run_epoch()


def test_lm_final_redecode_matches_single_stream(stream_model):
    """final_decoder: per-stream LM re-decode over the concatenated
    probability stream equals the single-stream engine's final output."""
    from danspeech_tpu.decode.beam import BeamCTCDecoder

    labels = stream_model.labels
    decoder = BeamCTCDecoder(
        labels=labels, lm_path=None, beam_width=8,
        blank_index=labels.index("_"),
    )

    n_chunks = 3
    streams = [_stream_audio(np.random.default_rng(40 + s), n_chunks)
               for s in range(2)]

    singles = []
    for s in range(2):
        eng = DanSpeechRecognizer(model_name=stream_model)
        eng.enable_streaming(secondary_model=None, return_string_parts=True)
        eng.decoder = decoder
        eng.lm = "beam"  # any non-greedy value puts the engine in LM mode
        final = None
        for ci in range(n_chunks):
            final = eng.streaming_transcribe(
                streams[s][ci],
                is_last=(ci == n_chunks - 1),
                is_first=(ci == 0),
            )
        singles.append(final)

    ms = MultiStreamTranscriber(stream_model, n_streams=2, final_decoder=decoder)
    out = None
    for ci in range(n_chunks):
        out = ms.step(
            [streams[s][ci] for s in range(2)],
            is_last=(ci == n_chunks - 1),
            is_first=(ci == 0),
        )
    assert out == singles


def test_rejects_ragged_cohort(stream_model):
    ms = MultiStreamTranscriber(stream_model, n_streams=2)
    with pytest.raises(ValueError):
        ms.step(
            [np.zeros(16000, np.float32), np.zeros(8000, np.float32)],
            is_last=False, is_first=True,
        )
