"""Feature extractors: batch and streaming log-spectrogram parsers.

TPU-native re-design of danspeech/audio/parsers.py — the STFT itself runs
on-device through :mod:`danspeech_tpu.ops.stft`; these classes own the
host-side state machines (sample buffering, adaptive normalization) that the
reference keeps in Python.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import stft as stft_ops
from .windows import get_window


def get_default_audio_config() -> dict:
    """Reference defaults (danspeech/deepspeech/utils.py:1-8)."""
    return {
        "normalize": True,
        "sampling_rate": 16000,
        "window": "hamming",
        "window_stride": 0.01,
        "window_size": 0.02,
    }


class AudioParser:
    """Shared config handling (reference parsers.py:13-34)."""

    def __init__(self, audio_config: dict | None = None):
        self.audio_config = dict(audio_config or {})
        self.normalize = self.audio_config.get("normalize", True)
        self.sampling_rate = self.audio_config.get("sampling_rate", 16000)
        self.window_name = self.audio_config.get("window", "hamming")
        self.window_stride = self.audio_config.get("window_stride", 0.01)
        self.window_size = self.audio_config.get("window_size", 0.02)

        self.n_fft = int(self.sampling_rate * self.window_size)
        self.hop_length = int(self.sampling_rate * self.window_stride)
        self.window_np = get_window(self.window_name, self.n_fft).astype(
            np.float32
        )
        self.window = jnp.asarray(self.window_np)

    def parse_audio(self, recording):
        raise NotImplementedError


class SpectrogramAudioParser(AudioParser):
    """One-shot utterance parser (reference parsers.py:37-72).

    Returns a (161, T) float32 device array: center-padded |STFT|, log1p,
    per-utterance mean/std (unbiased) normalization.
    """

    def parse_audio(self, recording) -> jnp.ndarray:
        y = jnp.asarray(np.asarray(recording), dtype=jnp.float32)
        return stft_ops.log_spectrogram(
            y,
            self.n_fft,
            self.hop_length,
            self.window,
            center=True,
            normalize=self.normalize,
        )


class InferenceSpectrogramAudioParser(AudioParser):
    """Streaming parser with rolling sample buffer + adaptive normalization.

    Replicates InferenceSpectrogramAudioParser (reference parsers.py:75-170)
    exactly:

    - chunks are STFT'd with ``center=False``; a ``hop_length``-sized sample
      tail (plus hop remainder) carries over so frames tile the stream,
    - normalization stats blend fixed NST dataset statistics with running
      input statistics, ramping ``alpha`` by 0.1 per chunk (≈1 s),
    - a final chunk is dropped (returns []) when buffer+chunk hold less
      than ``n_fft`` samples. (Deliberate divergence: the reference tests
      only the raw chunk, parsers.py:112-114, so it can discard a
      buffered frame's worth of trailing speech; we process any tail
      that still fills a frame.)
    """

    DATASET_MEAN = 5.492418704733003
    DATASET_STD = 1.7552755216970917

    def __init__(self, audio_config: dict | None = None):
        super().__init__(audio_config)
        self.input_mean = 0.0
        self.input_std = 0.0
        self.alpha = 0.0
        self.alpha_increment = 0.1
        self.buffer = None
        self.has_buffer = False

    def parse_audio(self, part_of_recording, is_last: bool = False):
        part = np.asarray(part_of_recording, dtype=np.float32)

        if self.has_buffer:
            part = np.concatenate((self.buffer, part), axis=None)

        if len(part) < self.n_fft:
            # too short for even one frame (ADVICE r3): a final chunk ends
            # the stream like the reference's short-final drop
            # (parsers.py:112-114 — the reference tests the raw chunk; we
            # test buffer+chunk so samples accumulated by the guard below
            # are processed rather than silently discarded); otherwise
            # hold every sample for the next chunk — without this,
            # n_frames <= 0 poisons the running mean/std with NaN (0
            # frames) or makes as_strided raise (negative frames)
            if is_last:
                self.reset()
                return []
            self.buffer = part
            self.has_buffer = True
            return []

        # Hold back the hop remainder so chunk boundaries tile exactly.
        extra_samples = len(part) % self.hop_length
        if extra_samples != 0:
            extra_samples_array = part[-extra_samples:]
            part = part[:-extra_samples]

        self.buffer = part[-self.hop_length :]
        if extra_samples != 0:
            self.buffer = np.concatenate((self.buffer, extra_samples_array), axis=None)
        self.has_buffer = True

        # Host numpy STFT: the per-chunk spectrogram is a ~100-frame rFFT
        # — microseconds on the host, but as a device op it cost 2+
        # dispatch/fetch round trips per chunk over the axon tunnel (the
        # dominant term of the measured per-chunk latency,
        # benchmarks/streaming_latency.json). The batch path stays on
        # device (ops/stft.py); parity with it is pinned in test_stft.py.
        n_frames = 1 + (len(part) - self.n_fft) // self.hop_length
        frames = np.lib.stride_tricks.as_strided(
            part,
            (n_frames, self.n_fft),
            (part.strides[0] * self.hop_length, part.strides[0]),
        )
        spect = np.log1p(
            np.abs(np.fft.rfft(frames * self.window_np, axis=-1)).T.astype(np.float32)
        )

        # Adaptive normalization (reference parsers.py:146-157). The running
        # stats use numpy biased std over the chunk, as np.std does there.
        self.alpha += self.alpha_increment
        chunk_mean = float(np.mean(spect))
        chunk_std = float(np.std(spect))
        self.input_mean = (self.input_mean + chunk_mean) / 2
        self.input_std = (self.input_std + chunk_std) / 2

        if self.alpha < 1.0:
            mean = self.input_mean * self.alpha + (1 - self.alpha) * self.DATASET_MEAN
            std = self.input_std * self.alpha + (1 - self.alpha) * self.DATASET_STD
        else:
            mean = self.input_mean
            std = self.input_std

        return (spect - mean) / std

    def reset(self):
        self.buffer = None
        self.has_buffer = False
        self.input_mean = 0.0
        self.input_std = 0.0
        self.alpha = 0.0
