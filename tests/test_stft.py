"""STFT / spectrogram parity tests.

librosa is unavailable in this image, so parity is pinned two independent
ways: (1) a straightforward numpy re-derivation of librosa.stft semantics
(reflect center pad + symmetric hamming + rfft), and (2) torch.stft with the
equivalent configuration. The reference parser is
/root/reference/danspeech/audio/parsers.py:37-72 (batch) and :75-170
(streaming).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from danspeech_tpu.features import (
    InferenceSpectrogramAudioParser,
    SpectrogramAudioParser,
    get_default_audio_config,
)
from danspeech_tpu.features.windows import hamming
from danspeech_tpu.ops import stft as stft_ops

N_FFT, HOP = 320, 160


def numpy_librosa_stft(y, n_fft=N_FFT, hop=HOP, center=True):
    """Independent re-derivation of librosa.stft magnitude (float64)."""
    w = hamming(n_fft)
    if center:
        y = np.pad(y, n_fft // 2, mode="reflect")
    t = 1 + (len(y) - n_fft) // hop
    frames = np.stack([y[i * hop : i * hop + n_fft] for i in range(t)])
    return np.abs(np.fft.rfft(frames * w, axis=-1)).T


def torch_stft_mag(y, n_fft=N_FFT, hop=HOP, center=True):
    w = torch.tensor(hamming(n_fft), dtype=torch.float64)
    out = torch.stft(
        torch.tensor(y, dtype=torch.float64),
        n_fft=n_fft,
        hop_length=hop,
        win_length=n_fft,
        window=w,
        center=center,
        pad_mode="reflect",
        return_complex=True,
    )
    return out.abs().numpy()


@pytest.fixture(scope="module")
def waveform(example_wav):
    from danspeech_tpu.audio import load_audio

    return load_audio(example_wav)


def test_hamming_matches_scipy_symmetric():
    from scipy.signal.windows import hamming as scipy_hamming

    np.testing.assert_allclose(hamming(320), scipy_hamming(320, sym=True), atol=1e-12)


@pytest.mark.parametrize("center", [True, False])
@pytest.mark.parametrize("use_fft", [False, True])
def test_magnitude_stft_parity(waveform, center, use_fft):
    y = waveform[:16000]
    ours = np.asarray(
        stft_ops.magnitude_stft(
            jnp.asarray(y, dtype=jnp.float32),
            N_FFT,
            HOP,
            jnp.asarray(hamming(N_FFT), dtype=jnp.float32),
            center=center,
            use_fft=use_fft,
        )
    )
    ref = numpy_librosa_stft(y, center=center)
    ref2 = torch_stft_mag(y, center=center)
    np.testing.assert_allclose(ref, ref2, rtol=1e-9, atol=1e-6)  # sanity: refs agree
    assert ours.shape == ref.shape
    # f32 accumulation over int16-scale frames leaves ~1e-3 relative error in
    # catastrophic-cancellation bins; after log1p + normalization this is
    # orders of magnitude below the feature std, so 3e-3 is the right bar.
    scale = np.maximum(np.abs(ref), 1.0)
    np.testing.assert_allclose(ours / scale, ref / scale, atol=3e-3)


def test_parser_output_shape_and_normalization(waveform):
    parser = SpectrogramAudioParser(get_default_audio_config())
    spect = np.asarray(parser.parse_audio(waveform))
    assert spect.shape[0] == 161
    assert spect.shape[1] == 1 + len(waveform) // HOP
    assert abs(spect.mean()) < 1e-4
    # torch-style unbiased std == 1
    assert abs(spect.std(ddof=1) - 1.0) < 1e-3


def test_parser_matches_reference_formula(waveform):
    y = waveform[:32000]
    parser = SpectrogramAudioParser(get_default_audio_config())
    ours = np.asarray(parser.parse_audio(y))
    ref = np.log1p(numpy_librosa_stft(y))
    ref32 = ref.astype(np.float32)
    ref_norm = (ref32 - ref32.mean()) / ref32.std(ddof=1)
    np.testing.assert_allclose(ours, ref_norm, atol=5e-3)


def reference_streaming_parser_chunks(y, chunk_sizes):
    """Numpy replica of InferenceSpectrogramAudioParser for arbitrary chunks."""
    dataset_mean, dataset_std = 5.492418704733003, 1.7552755216970917
    buf = None
    input_mean = input_std = 0.0
    alpha = 0.0
    outs = []
    pos = 0
    for i, size in enumerate(chunk_sizes):
        part = y[pos : pos + size]
        pos += size
        is_last = i == len(chunk_sizes) - 1
        if is_last and len(part) < N_FFT:
            outs.append(np.zeros((161, 0)))
            continue
        if buf is not None:
            part = np.concatenate((buf, part))
        extra = len(part) % HOP
        if extra:
            tail = part[-extra:]
            part = part[:-extra]
        buf = part[-HOP:]
        if extra:
            buf = np.concatenate((buf, tail))
        spect = np.log1p(numpy_librosa_stft(part, center=False))
        alpha += 0.1
        input_mean = (input_mean + spect.mean()) / 2
        input_std = (input_std + spect.std()) / 2
        if alpha < 1.0:
            mean = input_mean * alpha + (1 - alpha) * dataset_mean
            std = input_std * alpha + (1 - alpha) * dataset_std
        else:
            mean, std = input_mean, input_std
        outs.append((spect - mean) / std)
    return outs


def test_streaming_parser_matches_reference_replica(waveform):
    y = waveform[:24000]
    chunks = [4800, 5000, 4200, 6000, 4000]
    parser = InferenceSpectrogramAudioParser(get_default_audio_config())
    for i, size in enumerate(chunks):
        part = y[sum(chunks[:i]) : sum(chunks[: i + 1])]
        got = parser.parse_audio(part, is_last=(i == len(chunks) - 1))
        ref = reference_streaming_parser_chunks(y, chunks)[i]
        got = np.asarray(got)
        assert got.shape == ref.shape
        if ref.size:
            np.testing.assert_allclose(got, ref, atol=5e-3)


def test_streaming_parser_short_last_chunk_resets():
    parser = InferenceSpectrogramAudioParser(get_default_audio_config())
    out = parser.parse_audio(np.zeros(100), is_last=True)
    assert out == []
    assert parser.alpha == 0.0 and not parser.has_buffer


def test_streaming_parser_short_mid_chunk_buffers(waveform):
    """A non-final chunk shorter than n_fft must produce no frames and
    carry its samples into the next chunk (ADVICE r3: previously it
    poisoned the running stats with NaN or made as_strided raise). The
    concatenation of dribbled micro-chunks must yield the same frames and
    stats as one combined chunk."""
    y = waveform[:8000]
    parser = InferenceSpectrogramAudioParser(get_default_audio_config())
    outs = []
    for part in (y[:100], y[100:250], y[250:300], y[300:]):
        got = parser.parse_audio(part, is_last=False)
        outs.append(np.asarray(got))
    assert all(o.size == 0 for o in outs[:-1])
    assert np.isfinite(outs[-1]).all() and parser.input_std > 0

    one_shot = InferenceSpectrogramAudioParser(get_default_audio_config())
    ref = np.asarray(one_shot.parse_audio(y, is_last=False))
    np.testing.assert_allclose(outs[-1], ref, atol=1e-6)


def test_batched_log_spectrogram_matches_single(waveform):
    lens = [16000, 12000]
    maxlen = max(lens)
    batch = np.zeros((2, maxlen), dtype=np.float32)
    batch[0, : lens[0]] = waveform[: lens[0]]
    batch[1, : lens[1]] = waveform[20000 : 20000 + lens[1]]
    spects, frame_lens = stft_ops.batched_log_spectrogram(
        jnp.asarray(batch),
        jnp.asarray(lens),
        N_FFT,
        HOP,
        jnp.asarray(hamming(N_FFT), dtype=jnp.float32),
    )
    parser = SpectrogramAudioParser(get_default_audio_config())
    for i, ln in enumerate(lens):
        single = np.asarray(parser.parse_audio(batch[i, :ln]))
        t = single.shape[1]
        assert int(frame_lens[i]) == t
        np.testing.assert_allclose(
            np.asarray(spects)[i, :, :t], single, atol=2e-3
        )


def test_streaming_parser_buffered_tail_processed_on_last(waveform):
    """A final chunk whose buffer+chunk still fill a frame must emit it
    (code-review r4: the raw-chunk-only is_last test silently discarded
    guard-accumulated samples)."""
    parser = InferenceSpectrogramAudioParser(get_default_audio_config())
    y = waveform[:450]
    assert np.asarray(parser.parse_audio(y[:150], is_last=False)).size == 0
    assert np.asarray(parser.parse_audio(y[150:300], is_last=False)).size == 0
    out = np.asarray(parser.parse_audio(y[300:450], is_last=True))
    assert out.shape[0] == 161 and out.shape[1] >= 1  # the tail frame
    # (the parser does not self-reset after a normal final chunk — the
    # engine's reset_streaming_params owns that, like the reference)


def test_streaming_parser_short_fresh_last_still_drops():
    parser = InferenceSpectrogramAudioParser(get_default_audio_config())
    assert parser.parse_audio(np.zeros(100), is_last=True) == []
