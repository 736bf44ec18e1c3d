"""Time-sharded (sequence-parallel) forward == single-device forward.

Validates parallel/time_shard.py on an 8-device CPU mesh: halo-exchanged
conv stack, wavefront uni-directional GRU pipeline, two-direction
bidirectional ring, lookahead halo, and the end-to-end long-form path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from danspeech_tpu.models import DeepSpeechModel, deepspeech as ds
from danspeech_tpu.models.config import DeepSpeechConfig
from danspeech_tpu.parallel import make_mesh
from danspeech_tpu.parallel.time_shard import (
    pad_time_for_mesh,
    time_sharded_forward,
    transcribe_long_form,
)

N_DEV = 8


def _random_spect(b, t, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(b, 1, 161, t)).astype(np.float32)


def _compare(config, t_total, lengths, seed=1, tol=2e-4):
    params = ds.init_params(config, seed=seed)
    mesh = make_mesh(n_data=N_DEV)
    spect = pad_time_for_mesh(_random_spect(len(lengths), t_total, seed), N_DEV)
    lengths = jnp.asarray(lengths, jnp.int32)

    ref_probs, ref_lens = jax.jit(
        lambda p, x, l: ds.forward(p, config, x, l)
    )(params, jnp.asarray(spect), lengths)
    sh_probs, sh_lens = time_sharded_forward(
        params, config, jnp.asarray(spect), lengths, mesh
    )

    np.testing.assert_array_equal(np.asarray(ref_lens), np.asarray(sh_lens))
    ref, sh = np.asarray(ref_probs), np.asarray(sh_probs)
    for i, n_frames in enumerate(np.asarray(ref_lens)):
        np.testing.assert_allclose(
            sh[i, :n_frames], ref[i, :n_frames], atol=tol, rtol=1e-3
        )


def test_bidirectional_ring_parity():
    config = DeepSpeechConfig(
        model_name="t", rnn_hidden_size=64, rnn_layers=3, conv_layers=2
    )
    _compare(config, t_total=160, lengths=[74])


def test_bidirectional_3conv_batch_parity():
    config = DeepSpeechConfig(
        model_name="t", rnn_hidden_size=48, rnn_layers=2, conv_layers=3
    )
    # two rows; second ends mid-ring so masking + frozen-h handoff is hit
    _compare(config, t_total=192, lengths=[96, 41])


def test_unidirectional_wavefront_parity():
    config = DeepSpeechConfig(
        model_name="t",
        rnn_hidden_size=64,
        rnn_layers=4,
        conv_layers=2,
        bidirectional=False,
        context=20,
    )
    _compare(config, t_total=160, lengths=[80])


def test_unidirectional_length_mid_shard():
    config = DeepSpeechConfig(
        model_name="t",
        rnn_hidden_size=32,
        rnn_layers=2,
        conv_layers=2,
        bidirectional=False,
        context=5,
    )
    _compare(config, t_total=160, lengths=[33])


def test_transcribe_long_form_matches_batch_path(example_wav):
    from danspeech_tpu.audio import load_audio_wavPCM
    from danspeech_tpu.decode.greedy import GreedyDecoder
    from danspeech_tpu.features.spectrogram import SpectrogramAudioParser
    from danspeech_tpu.ops import stft as stft_ops

    config = DeepSpeechConfig(
        model_name="t", rnn_hidden_size=64, rnn_layers=2, conv_layers=2
    )
    model = DeepSpeechModel(config, ds.init_params(config, seed=3))
    mesh = make_mesh(n_data=N_DEV)

    wav = load_audio_wavPCM(example_wav)
    text_sharded = transcribe_long_form(model, wav, mesh)

    parser = SpectrogramAudioParser(config.audio_conf)
    spect, frame_len = stft_ops.batched_log_spectrogram(
        jnp.asarray(wav[None, :]),
        jnp.asarray([len(wav)], jnp.int32),
        parser.n_fft,
        parser.hop_length,
        parser.window,
        normalize=parser.normalize,
    )
    probs, out_lens = jax.jit(lambda p, x, l: ds.forward(p, config, x, l))(
        model.params, spect[:, None, :, :], frame_len
    )
    decoded, _ = GreedyDecoder(config.labels).decode(
        np.asarray(probs), np.asarray(out_lens)
    )
    assert text_sharded == decoded[0][0]
