"""Native FLAC decoder tests (native/flacdec via danspeech_tpu.audio.flac).

Fixtures under tests/data/ were encoded with the upstream `flac` 1.3.2 encoder
(max compression -8 for stereo, -0 for mono) from the .wav files stored beside
them; the decoder must reproduce the PCM bit-exactly. Replaces the reference's
bundled GPL flac binaries (/root/reference/danspeech/audio/flac-*,
resources.py:97-139).
"""

import os
import wave

import numpy as np
import pytest

from danspeech_tpu.audio.flac import decode_flac

DATA = os.path.join(os.path.dirname(__file__), "data")


def _read_wav(path):
    with wave.open(path, "rb") as w:
        return (
            w.getnchannels(),
            w.getsampwidth(),
            w.getframerate(),
            w.readframes(w.getnframes()),
        )


@pytest.mark.parametrize("name", ["clip_mono", "clip_stereo"])
def test_decode_bit_exact(name):
    with open(os.path.join(DATA, name + ".flac"), "rb") as f:
        ch, sw, rate, pcm = decode_flac(f.read())
    rch, rsw, rrate, rpcm = _read_wav(os.path.join(DATA, name + ".wav"))
    assert (ch, sw, rate) == (rch, rsw, rrate)
    assert np.array_equal(
        np.frombuffer(pcm, np.int16), np.frombuffer(rpcm, np.int16)
    )


def test_rejects_non_flac():
    with pytest.raises(ValueError):
        decode_flac(b"RIFFxxxxWAVE")


def test_rejects_truncated():
    with open(os.path.join(DATA, "clip_mono.flac"), "rb") as f:
        data = f.read()
    with pytest.raises((RuntimeError, ValueError)):
        decode_flac(data[: len(data) // 3])
