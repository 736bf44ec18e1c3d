"""Audio I/O and DSP parity tests.

DSP primitives are pinned against the CPython ``audioop`` C module (still
present on 3.12) and loaders against scipy, using both synthesized PCM and
the reference example WAVs.
"""

import audioop
import io
import struct
import wave

import numpy as np
import pytest

from danspeech_tpu.audio import AudioData, SpeechFile, load_audio, load_audio_wavPCM
from danspeech_tpu.audio import dsp
from danspeech_tpu.audio.io import parse_aiff

RNG = np.random.default_rng(1234)


def random_pcm(n=4096, width=2, seed=0):
    rng = np.random.default_rng(seed)
    bits = 8 * width
    samples = rng.integers(-(1 << (bits - 1)), (1 << (bits - 1)) - 1, size=n)
    return dsp.int_array_to_pcm(samples, width)


@pytest.mark.parametrize("width", [1, 2, 4])
def test_rms_matches_audioop(width):
    data = random_pcm(width=width, seed=width)
    if width == 1:
        # audioop treats 8-bit as signed here; our pcm encoder emits signed too
        assert dsp.rms(data, width) == audioop.rms(data, width)
    else:
        assert dsp.rms(data, width) == audioop.rms(data, width)


@pytest.mark.parametrize("width", [2, 4])
def test_tomono_matches_audioop(width):
    data = random_pcm(n=2048, width=width, seed=7)
    assert dsp.tomono(data, width, 1, 1) == audioop.tomono(data, width, 1, 1)


@pytest.mark.parametrize("width", [2, 4])
def test_byteswap_matches_audioop(width):
    data = random_pcm(width=width, seed=3)
    assert dsp.byteswap(data, width) == audioop.byteswap(data, width)


@pytest.mark.parametrize("pair", [(2, 4), (4, 2), (2, 1), (1, 2)])
def test_lin2lin_matches_audioop(pair):
    src, dst = pair
    data = random_pcm(width=src, seed=src * 10 + dst)
    assert dsp.lin2lin(data, src, dst) == audioop.lin2lin(data, src, dst)


def test_bias_matches_audioop():
    data = random_pcm(width=1, seed=9)
    assert dsp.bias(data, 1, -128) == audioop.bias(data, 1, -128)
    assert dsp.bias(data, 1, 128) == audioop.bias(data, 1, 128)


def test_pcm_24bit_roundtrip():
    rng = np.random.default_rng(5)
    samples = rng.integers(-(1 << 23), (1 << 23) - 1, size=1000)
    pcm = dsp.int_array_to_pcm(samples, 3)
    back = dsp.pcm_to_int_array(pcm, 3)
    np.testing.assert_array_equal(back, samples)


def test_ratecv_linear_halving():
    t = np.arange(0, 1600)
    sig = (1000 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int64)
    pcm = dsp.int_array_to_pcm(sig, 2)
    out = dsp.ratecv_linear(pcm, 2, 1, 16000, 8000)
    arr = dsp.pcm_to_int_array(out, 2)
    assert arr.size == 800
    # downsampled-by-2 linear interp lands exactly on even input samples
    np.testing.assert_allclose(arr, sig[::2], atol=1)


def test_load_audio_wav_matches_scipy(example_wav):
    ours = load_audio(example_wav)
    fast = load_audio_wavPCM(example_wav)
    # load_audio sums stereo channels (audioop.tomono 1,1); fast path averages
    assert ours.shape == fast.shape
    np.testing.assert_allclose(ours, fast * 2.0, atol=1.5)


def test_load_audio_offset_duration(example_wav):
    full = load_audio(example_wav)
    part = load_audio(example_wav, duration=1.0)
    assert 0 < part.size <= 16384  # about a second in 4096-frame chunks
    np.testing.assert_array_equal(part, full[: part.size])


def test_audio_data_segment_and_wav_roundtrip():
    pcm = random_pcm(n=16000, width=2, seed=11)
    audio = AudioData(pcm, 16000, 2)
    seg = audio.get_segment(start_ms=100, end_ms=200)
    assert len(seg.frame_data) == 1600 * 2
    wav_bytes = audio.get_wav_data()
    with wave.open(io.BytesIO(wav_bytes)) as r:
        assert r.getframerate() == 16000
        assert r.getnchannels() == 1
        assert r.readframes(r.getnframes()) == pcm


def _float80(value: float) -> bytes:
    """Encode a positive int-valued float as 80-bit IEEE extended (AIFF rate)."""
    import math

    mant, exp = math.frexp(value)
    mantissa = int(mant * (1 << 64))
    exponent = exp - 1 + 16383
    return struct.pack(">H", exponent) + mantissa.to_bytes(8, "big")


def _build_aiff(samples: np.ndarray, framerate=16000, nchannels=1):
    """Minimal big-endian AIFF writer for testing the parser."""
    pcm = samples.astype(">i2").tobytes()
    comm = struct.pack(">hIh", nchannels, len(samples) // nchannels, 16) + _float80(
        float(framerate)
    )
    ssnd = struct.pack(">II", 0, 0) + pcm
    body = b"AIFF"
    body += b"COMM" + struct.pack(">I", len(comm)) + comm
    body += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd + (b"\x00" if len(ssnd) & 1 else b"")
    return b"FORM" + struct.pack(">I", len(body)) + body


def test_parse_aiff_roundtrip():
    rng = np.random.default_rng(21)
    samples = rng.integers(-30000, 30000, size=3200)
    data = _build_aiff(samples)
    nch, width, rate, pcm = parse_aiff(data)
    assert (nch, width, rate) == (1, 2, 16000)
    got = dsp.pcm_to_int_array(pcm, 2)
    np.testing.assert_array_equal(got, samples)


def test_speechfile_reads_aiff(tmp_path):
    rng = np.random.default_rng(22)
    samples = rng.integers(-30000, 30000, size=3200)
    p = tmp_path / "x.aiff"
    p.write_bytes(_build_aiff(samples))
    with SpeechFile(str(p)) as src:
        data = src.stream.read(-1)
    np.testing.assert_array_equal(dsp.pcm_to_int_array(data, 2), samples)


def test_energy_vad_segments_finds_speech_region():
    from danspeech_tpu.audio.dsp import energy_vad_segments

    # int16 sample scale, like every loader in danspeech_tpu.audio
    x = np.zeros(160000, np.float32)  # 10 s
    x[16000:80000] = (
        np.sin(np.arange(64000) * 0.3) * 0.3 * 32767
    ).astype(np.float32)
    segs = energy_vad_segments(x)
    assert len(segs) == 1
    a, b = segs[0]
    assert abs(a - 16000) < 2048 and abs(b - 80000) < 16000


def test_energy_vad_segments_silence_returns_empty():
    from danspeech_tpu.audio.dsp import energy_vad_segments

    assert energy_vad_segments(np.zeros(64000, np.float32)) == []


def test_ulaw_matches_audioop():
    """numpy G.711 mu-law == CPython audioop (14-bit internals, floor
    pre-shift) over the full int16 range, both directions."""
    from danspeech_tpu.audio.dsp import ulaw_decode_table, ulaw_encode

    x = np.arange(-32768, 32768, dtype=np.int16)
    ref_enc = np.frombuffer(audioop.lin2ulaw(x.tobytes(), 2), np.uint8)
    np.testing.assert_array_equal(ulaw_encode(x), ref_enc)

    codes = np.arange(256, dtype=np.uint8)
    ref_dec = np.frombuffer(audioop.ulaw2lin(codes.tobytes(), 2), np.int16)
    np.testing.assert_array_equal(ulaw_decode_table()[codes], ref_dec)
    # silence encodes to a code that decodes back to exactly 0 (the
    # engine's pad-tail invariant for conv boundaries)
    assert ulaw_decode_table()[ulaw_encode(np.zeros(1, np.int16))[0]] == 0


def test_load_audio_pcm16_rejects_non_int16(tmp_path):
    """A non-int16 WAV must raise BEFORE any downmix cast could silently
    quantize it to garbage (code-review r4 finding #2)."""
    import scipy.io.wavfile as wavfile

    from danspeech_tpu.audio import load_audio_pcm16

    rng = np.random.default_rng(0)
    stereo_f32 = rng.normal(size=(800, 2)).astype(np.float32) * 0.5
    p = tmp_path / "f32_stereo.wav"
    wavfile.write(p, 16000, stereo_f32)
    with pytest.raises(ValueError, match="not 16-bit PCM"):
        load_audio_pcm16(str(p))

    stereo_i16 = (stereo_f32 * 30000).astype(np.int16)
    p2 = tmp_path / "i16_stereo.wav"
    wavfile.write(p2, 16000, stereo_i16)
    out = load_audio_pcm16(str(p2))
    np.testing.assert_array_equal(
        out, np.rint(stereo_i16.mean(axis=1)).astype(np.int16)
    )
