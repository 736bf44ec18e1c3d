"""Masked (fixed-shape, bucketed) streaming == exact-shape streaming.

The engine pads each chunk's spectrogram to a CHUNK_BUCKET multiple and
runs models/streaming.streaming_step_masked with the true frame count as a
traced scalar; this must be numerically identical to the exact-shape
streaming_step (itself parity-pinned against the torch streaming twin in
test_streaming_parity.py) for every chunk-length pattern.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from danspeech_tpu.models import deepspeech as ds
from danspeech_tpu.models.config import DeepSpeechConfig
from danspeech_tpu.models.streaming import (
    CHUNK_HEADROOM,
    init_stream_state,
    init_stream_state_masked,
    phys_rnn_frames,
    streaming_step,
    streaming_step_masked,
)

from test_model_parity import randomize_bn


def _bucket(n, q):
    return max(q, ((n + q - 1) // q) * q)


@pytest.fixture(scope="module")
def setup():
    config = DeepSpeechConfig(
        model_name="stream-masked",
        rnn_hidden_size=64,
        rnn_layers=2,
        conv_layers=2,
        bidirectional=False,
        context=20,
    )
    params = randomize_bn(ds.init_params(config, seed=5), seed=6)
    return config, params


@pytest.mark.parametrize(
    "chunk_frames",
    [
        [53, 40, 40, 40, 27],  # typical real-time pattern + short last
        [48, 48, 17],  # short last chunk under the lookahead context
        [60, 33, 41, 29, 38, 22],  # irregular
    ],
)
def test_masked_matches_exact(setup, chunk_frames):
    config, params = setup
    rng = np.random.default_rng(11)
    bucket = 16

    exact_state = init_stream_state(config)
    buf_cap = _bucket(
        phys_rnn_frames(
            _bucket(chunk_frames[0] + CHUNK_HEADROOM, bucket), is_first=True
        ),
        16,
    )
    masked_state = init_stream_state_masked(config, buf_cap=buf_cap)

    n_chunks = len(chunk_frames)
    for i, t in enumerate(chunk_frames):
        is_first = i == 0
        is_last = i == n_chunks - 1
        spect = rng.normal(size=(config.n_freq, t)).astype(np.float32)

        x_exact = jnp.asarray(spect)[None, None]
        probs_e, exact_state = streaming_step(
            params, config, x_exact, exact_state, is_first, is_last
        )

        tp = _bucket(t + CHUNK_HEADROOM, bucket)
        padded = np.zeros((config.n_freq, tp), np.float32)
        padded[:, :t] = spect
        x_masked = jnp.asarray(padded)[None, None]
        probs_m, out_len, masked_state = streaming_step_masked(
            params, config, x_masked, t, masked_state, is_first, is_last
        )

        if probs_e is None:
            assert probs_m is None
            continue
        probs_e = np.asarray(probs_e)
        probs_m = np.asarray(probs_m)[:, : int(out_len)]
        assert probs_m.shape == probs_e.shape, (
            f"chunk {i}: {probs_m.shape} vs {probs_e.shape}"
        )
        np.testing.assert_allclose(probs_m, probs_e, atol=1e-5, rtol=1e-4)


def test_engine_streaming_uses_bounded_compilations(setup, monkeypatch):
    """The engine pads chunks into buckets: feeding many distinct chunk
    lengths compiles at most one step per (flags, bucket) pair."""
    from danspeech_tpu.engine import DanSpeechRecognizer
    from danspeech_tpu.models import DeepSpeechModel

    config, params = setup
    model = DeepSpeechModel(config, params)
    eng = DanSpeechRecognizer()
    eng.update_model(model)
    eng.enable_streaming(return_string_parts=False)

    rng = np.random.default_rng(3)
    # feed raw samples; the parser re-chunks internally
    sizes = [16000, 15200, 14400, 15800, 15000, 9000]
    outputs = []
    for i, n in enumerate(sizes):
        wav = rng.normal(size=n).astype(np.float32) * 500
        out = eng.streaming_transcribe(
            wav, is_last=(i == len(sizes) - 1), is_first=(i == 0)
        )
        outputs.append(out)
    assert isinstance(outputs[-1], str)
    # bounded compile cache: one entry per (is_first, is_last) combination
    assert len(eng._stream_fns) <= 3
