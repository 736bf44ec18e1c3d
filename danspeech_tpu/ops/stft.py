"""STFT log-magnitude spectrogram ops (device-side, jit-friendly).

Replaces the reference's librosa/scipy STFT path (parsers.py:59-60,138-139)
with a TPU-first implementation: framing is a static gather, the DFT is
either an XLA rFFT or a real-valued matmul DFT that runs on the MXU (two
(T,320)x(320,161) matmuls — for 20 ms windows this is the fastest path and
fuses with the downstream log1p/normalize).

Numerics are pinned to ``librosa.stft(y, n_fft, hop, win_length=n_fft,
window=scipy.signal.hamming, center=...)`` + ``log1p`` + mean/std normalize
(torch unbiased std), which is exactly what the reference parsers compute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _dft_matrices(n_fft: int, dtype_name: str):
    """Real/imag DFT basis (n_fft, n_fft//2+1), cached per size+dtype.

    Cached as *numpy* so a jit trace never leaks tracers into the cache;
    jnp converts them to on-device constants at the use site.
    """
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(n_fft)
    ang = -2.0 * np.pi * np.outer(n, k) / n_fft
    dtype = np.dtype(dtype_name)
    return np.cos(ang).astype(dtype), np.sin(ang).astype(dtype)


def num_frames(n_samples: int, n_fft: int, hop: int, center: bool) -> int:
    """Frame count matching librosa for the given padding mode."""
    if center:
        return 1 + n_samples // hop
    return 1 + (n_samples - n_fft) // hop


def _overlap_frames(y: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """(n,) -> (1 + (n - n_fft)//hop, n_fft) overlapping frames.

    Fast path when ``n_fft`` is a multiple of ``hop`` (320/160 here): the
    signal reshapes to hop-sized rows and each frame is a concatenation of
    ``n_fft//hop`` consecutive rows — pure reshapes/slices, no gather, which
    matters on TPU where a (T, 320) gather dominates the whole STFT.
    """
    n = y.shape[0]
    t = 1 + (n - n_fft) // hop
    if n_fft % hop == 0:
        k = n_fft // hop
        rows = y[: (n // hop) * hop].reshape(-1, hop)
        chunks = [rows[i : i + t] for i in range(k)]
        return jnp.concatenate(chunks, axis=1)
    idx = jnp.arange(t)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return y[idx]


def frame_signal(y: jnp.ndarray, n_fft: int, hop: int, center: bool) -> jnp.ndarray:
    """Slice a 1-D signal into overlapping frames, shape (T, n_fft).

    ``center=True`` reflect-pads by n_fft//2 on both sides first (librosa's
    default batch path, parsers.py:59); ``center=False`` is the streaming
    variant (parsers.py:138).
    """
    if center:
        y = jnp.pad(y, n_fft // 2, mode="reflect")
    return _overlap_frames(y, n_fft, hop)


def magnitude_stft(
    y: jnp.ndarray,
    n_fft: int,
    hop: int,
    window: jnp.ndarray,
    center: bool = True,
    use_fft: bool = False,
) -> jnp.ndarray:
    """|STFT| of a 1-D signal -> (n_fft//2+1, T), librosa layout.

    ``use_fft=False`` routes the DFT through two matmuls (MXU); ``True`` uses
    XLA's rFFT. Both give identical results to float32 tolerance.
    """
    frames = frame_signal(y, n_fft, hop, center) * window[None, :]
    if use_fft:
        spec = jnp.abs(jnp.fft.rfft(frames, axis=-1))
    else:
        cos_m, sin_m = _dft_matrices(n_fft, str(frames.dtype))
        re = jnp.dot(frames, cos_m, preferred_element_type=jnp.float32)
        im = jnp.dot(frames, sin_m, preferred_element_type=jnp.float32)
        spec = jnp.sqrt(re * re + im * im)
    return spec.T


def log_spectrogram(
    y: jnp.ndarray,
    n_fft: int,
    hop: int,
    window: jnp.ndarray,
    center: bool = True,
    normalize: bool = True,
    use_fft: bool = False,
) -> jnp.ndarray:
    """log1p magnitude spectrogram with per-utterance mean/std normalization.

    Matches SpectrogramAudioParser.parse_audio (parsers.py:50-72): std is the
    torch unbiased estimator (ddof=1).
    """
    spect = jnp.log1p(magnitude_stft(y, n_fft, hop, window, center, use_fft))
    if normalize:
        mean = jnp.mean(spect)
        std = jnp.std(spect, ddof=1)
        spect = (spect - mean) / std
    return spect


def streaming_log_spectrogram(
    y: jnp.ndarray,
    n_fft: int,
    hop: int,
    window: jnp.ndarray,
    mean: jnp.ndarray,
    std: jnp.ndarray,
    use_fft: bool = False,
) -> jnp.ndarray:
    """Chunked-path spectrogram: center=False, caller-supplied adaptive stats.

    The adaptive mean/std blending lives in the streaming featurizer state
    machine (see features/spectrogram.py), mirroring
    InferenceSpectrogramAudioParser (parsers.py:101-163).
    """
    spect = jnp.log1p(magnitude_stft(y, n_fft, hop, window, center=False, use_fft=use_fft))
    return (spect - mean) / std


def batched_log_spectrogram(
    batch: jnp.ndarray,
    lengths: jnp.ndarray,
    n_fft: int,
    hop: int,
    window: jnp.ndarray,
    normalize: bool = True,
    use_fft: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batch spectrograms for padded waveforms -> ((B, F, T), frame_lengths).

    Per-utterance normalization statistics are computed over only the valid
    frames of each row (mask from ``lengths``), so a padded batch reproduces
    the reference's one-utterance-at-a-time numerics. This is the DP entry
    point: rows shard over the data mesh axis.
    """
    n_samples = batch.shape[-1]
    t = num_frames(n_samples, n_fft, hop, center=True)
    half = n_fft // 2

    def one(y, length):
        # librosa center=True reflect-pads both ends of the *utterance*; for a
        # zero-padded batch row the right reflection must happen at the
        # dynamic length boundary, not at the padded end:
        #   y_pad[half + length + k] = y[length - 2 - k],  k in [0, half)
        padded = jnp.pad(y, (half, half), mode="constant")
        start = jnp.maximum(length - half - 1, 0)
        tail = jax.lax.dynamic_slice(y, (start,), (half,))  # y[length-half-1 : length-1]
        padded = jax.lax.dynamic_update_slice(padded, tail[::-1], (half + length,))
        # left edge: rows are valid from 0, so plain reflect is correct
        padded = padded.at[:half].set(y[1 : half + 1][::-1])
        frames = _overlap_frames(padded, n_fft, hop) * window[None, :]
        if use_fft:
            spec = jnp.abs(jnp.fft.rfft(frames, axis=-1))
        else:
            cos_m, sin_m = _dft_matrices(n_fft, str(frames.dtype))
            re = jnp.dot(frames, cos_m, preferred_element_type=jnp.float32)
            im = jnp.dot(frames, sin_m, preferred_element_type=jnp.float32)
            spec = jnp.sqrt(re * re + im * im)
        return jnp.log1p(spec.T)

    spect = jax.vmap(one)(batch, lengths)  # (B, F, T)
    frame_lengths = 1 + lengths // hop
    if normalize:
        mask = (jnp.arange(t)[None, :] < frame_lengths[:, None]).astype(spect.dtype)
        mask3 = mask[:, None, :]
        count = jnp.maximum(frame_lengths.astype(spect.dtype) * spect.shape[1], 1.0)
        s = jnp.sum(spect * mask3, axis=(1, 2))
        mean = s / count
        var = jnp.sum(jnp.square(spect - mean[:, None, None]) * mask3, axis=(1, 2)) / jnp.maximum(
            count - 1.0, 1.0
        )
        std = jnp.sqrt(var)
        # degenerate all-constant rows (e.g. a zero-weight padding row from
        # the training batcher, train/data.py) have std == 0; dividing by 1
        # instead keeps the whole batch NaN-free without touching real-audio
        # numerics (real rows never have exactly-zero std)
        std = jnp.where(std == 0.0, 1.0, std)
        spect = (spect - mean[:, None, None]) / std[:, None, None]
        spect = spect * mask3  # keep padding at exactly zero
    return spect, frame_lengths
