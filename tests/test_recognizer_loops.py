"""L5 orchestration coverage (VERDICT r2 item 5): the listen/VAD loops,
background listener thread, silence-segmented streaming generator, chunked
real-time streaming generator, and mic calibration — driven end-to-end
from a fake SpeechSource replaying deterministic PCM.

Reference flows: /root/reference/danspeech/Recognizer.py:133-797 (listen
:133, listen_stream :218, listen_in_background :339, streaming :439,
real_time_streaming :560, adjust_* :717-797).
"""

import math
import time

import numpy as np
import pytest

from danspeech_tpu import Recognizer
from danspeech_tpu.audio.dsp import rms
from danspeech_tpu.audio.io import AudioData, SpeechSource, _PCMStream
from danspeech_tpu.errors import (
    NoDataInBuffer,
    WaitTimeoutError,
    WrongUsageOfListen,
)
from danspeech_tpu.models import DeepSpeechModel
from danspeech_tpu.models.config import DeepSpeechConfig

from test_model_parity import randomize_bn

RATE = 16000
CHUNK = 1024


class FakeSource(SpeechSource):
    """In-memory SpeechSource over a float waveform (16-bit mono PCM)."""

    def __init__(self, waveform: np.ndarray, chunk: int = CHUNK):
        self.sampling_rate = RATE
        self.sampling_width = 2
        self.chunk = chunk
        self._pcm = (
            np.clip(waveform, -1.0, 1.0) * 32767
        ).astype("<i2").tobytes()
        self.stream = None

    def __enter__(self):
        self.stream = _PCMStream(self._pcm, 2)
        return self

    def __exit__(self, *exc):
        self.stream = None


def silence(seconds: float) -> np.ndarray:
    return np.zeros(int(seconds * RATE), np.float32)


def speech(seconds: float, seed: int = 0, amp: float = 0.3) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return (rng.uniform(-1, 1, int(seconds * RATE)) * amp).astype(np.float32)


@pytest.fixture(scope="module")
def model():
    config = DeepSpeechConfig(
        model_name="loops-test", rnn_hidden_size=64, rnn_layers=2, conv_layers=2
    )
    m = DeepSpeechModel.init_random(config, seed=21)
    m.params = randomize_bn(m.params, seed=22)
    return m


@pytest.fixture(scope="module")
def stream_model():
    import jax.numpy as jnp  # noqa: F401  (jax initialized by conftest)

    cfg = DeepSpeechConfig(
        model_name="loops-stream", rnn_hidden_size=64, rnn_layers=2,
        conv_layers=2, bidirectional=False, context=20,
    )
    m = DeepSpeechModel.init_random(cfg, seed=31)
    m.params = randomize_bn(m.params, seed=32)
    fc = m.params["fc"]
    m.params = {**m.params, "fc": fc._replace(weight=fc.weight * 4.0)}
    return m


def make_recognizer(model=None) -> Recognizer:
    rec = Recognizer(model=model)
    rec.dynamic_energy_threshold = False  # deterministic endpointing
    rec.energy_threshold = 1000
    return rec


# ---------------------------------------------------------------------------
# listen (blocking, reference :133-216)
# ---------------------------------------------------------------------------


def test_listen_captures_phrase():
    wave = np.concatenate([silence(0.5), speech(1.5), silence(1.2)])
    rec = make_recognizer()
    with FakeSource(wave) as src:
        audio = rec.listen(src)
    assert isinstance(audio, AudioData)
    arr = audio.get_array_data()
    # captured = <= non_speaking leading context + speech + trailing pause
    n = len(arr)
    assert 1.5 * RATE <= n <= (0.35 + 1.5 + 0.8 + 0.2) * RATE
    # the loud region is fully inside the capture
    assert rms(audio.frame_data, 2) > 1000 * 0.5

    # deterministic: an identical source captures identical bytes
    with FakeSource(wave) as src2:
        audio2 = rec.listen(src2)
    assert audio2.frame_data == audio.frame_data


def test_listen_timeout_on_silence():
    rec = make_recognizer()
    with FakeSource(silence(3.0)) as src:
        with pytest.raises(WaitTimeoutError):
            rec.listen(src, timeout=0.5)


def test_listen_phrase_time_limit():
    wave = np.concatenate([speech(3.0), silence(1.2)])
    rec = make_recognizer()
    with FakeSource(wave) as src:
        audio = rec.listen(src, phrase_time_limit=1.0)
    # capture stops ~1 s into the 3 s phrase
    assert len(audio.get_array_data()) <= 1.6 * RATE


def test_dynamic_energy_threshold_decays_during_silence():
    rec = make_recognizer()
    rec.dynamic_energy_threshold = True
    wave = np.concatenate([silence(1.0), speech(1.0), silence(1.2)])
    with FakeSource(wave) as src:
        rec.listen(src)
    # every silent wait chunk pulls the threshold toward energy*ratio = 0
    assert rec.energy_threshold < 1000


# ---------------------------------------------------------------------------
# listen_stream generator (reference :218-324)
# ---------------------------------------------------------------------------


def test_listen_stream_yield_protocol():
    wave = np.concatenate([silence(0.5), speech(1.0), silence(1.2)])
    rec = make_recognizer()
    rec.stream = True
    with FakeSource(wave) as src:
        gen = rec.listen_stream(src)
        yields = []
        is_last = False
        while not is_last:
            is_last, data = next(gen)
            yields.append((is_last, data))
        # exhausting past is_last raises the reference's usage error
        with pytest.raises(WrongUsageOfListen):
            next(gen)

    # first yield: leading-context frame list; middles: raw buffers; one
    # final is_last yield
    assert isinstance(yields[0][1], list)
    assert all(not last for last, _ in yields[:-1])
    assert yields[-1][0] is True
    n_buffers = sum(1 for last, d in yields[1:] if isinstance(d, bytes))
    assert n_buffers >= int(1.0 * RATE / CHUNK)  # at least the speech chunks


def collect_segments(rec: Recognizer, source) -> list[np.ndarray]:
    """Synchronous replay of threaded_listen: assemble one waveform per
    detected phrase exactly as Recognizer.streaming() concatenates it."""
    segments = []
    rec.stream = True
    with source as s:
        while True:
            gen = rec.listen_stream(s)
            parts = []
            is_last = False
            while not is_last:
                is_last, data = next(gen)
                parts.append(
                    Recognizer.get_audio_data(
                        data if isinstance(data, list) else [data], s
                    )
                )
            seg = np.concatenate(parts) if parts else np.zeros(0)
            if len(seg) == 0:
                return segments
            segments.append(seg)


# ---------------------------------------------------------------------------
# listen_in_background (reference :339-400)
# ---------------------------------------------------------------------------


def test_listen_in_background_and_stopper():
    wave = np.concatenate([silence(0.4), speech(1.0), silence(1.2)])
    rec = make_recognizer()
    rec.stream = True
    stopper, get_data = rec.listen_in_background(FakeSource(wave))

    chunks = []
    deadline = time.time() + 10
    while time.time() < deadline:
        try:
            is_last, arr = get_data()
        except NoDataInBuffer:
            time.sleep(0.01)
            continue
        chunks.append(arr)
        if is_last:
            break
    else:
        pytest.fail("background listener never delivered is_last")
    stopper(wait_for_stop=True)

    got = np.concatenate(chunks)
    expected = collect_segments(make_recognizer(), FakeSource(wave))[0]
    np.testing.assert_array_equal(got, expected)


# ---------------------------------------------------------------------------
# streaming generator (reference :439-497)
# ---------------------------------------------------------------------------


def test_streaming_transcribes_each_phrase(model):
    """Two spoken phrases -> two transcripts, each equal to recognize() on
    the synchronously-replayed segment assembly. NOTE reference semantics:
    the mininum_required_speaking_seconds check measures the assembled
    segment INCLUDING captured pause silence, so even a 0.4 s phrase
    passes once its ~1 s of endpointing context is counted — only the
    trailing all-silence segment is skipped."""
    wave = np.concatenate(
        [silence(0.4), speech(0.4, seed=1), silence(1.2),
         speech(1.5, seed=2), silence(1.2)]
    )
    rec = make_recognizer(model)
    rec.enable_streaming()
    gen = rec.streaming(FakeSource(wave))
    outs = [next(gen), next(gen)]
    rec.disable_streaming()

    segs = collect_segments(make_recognizer(), FakeSource(wave))
    # phrase 1 (short speech + pause), phrase 2, trailing silence segment
    assert len(segs) == 3
    long_enough = [s for s in segs if len(s) > 0.7 * RATE]
    assert len(long_enough) == 2
    assert outs == [rec.recognize(s) for s in long_enough]


# ---------------------------------------------------------------------------
# real_time_streaming generator (reference :560-715)
# ---------------------------------------------------------------------------


class ScriptedFeed:
    """Deterministic stand-in for listen_in_background's get_data: yields
    one scripted (is_last, chunk) per consumer pass by raising
    NoDataInBuffer between items."""

    def __init__(self, items):
        self.items = list(items)
        self.starve = False
        self.stopped = False

    def get_data(self):
        if self.starve or not self.items:
            self.starve = False
            raise NoDataInBuffer
        self.starve = True
        return self.items.pop(0)

    def stopper(self, wait_for_stop=True):
        self.stopped = True


def test_real_time_streaming_matches_direct_engine(stream_model):
    """Drive real_time_streaming with scripted chunks and pin every yield
    against direct engine.streaming_transcribe calls that replicate the
    documented sample-requirement accumulation (reference :602-611)."""
    context = stream_model.context
    required_spec_frames = (context - 1) * 2
    per10ms = RATE // 100
    general_req = per10ms * 2 + per10ms * (required_spec_frames - 1)
    first_req = general_req + per10ms * 15
    assert (first_req, general_req) == (8640, 6240)  # context=20

    step = 3200
    wave = speech(22 * step / RATE, seed=7)
    chunks = [wave[i * step:(i + 1) * step] for i in range(22)]
    script = [(i == len(chunks) - 1, c) for i, c in enumerate(chunks)]

    rec = make_recognizer()
    feed = ScriptedFeed(script)
    rec.listen_in_background = lambda source: (feed.stopper, feed.get_data)
    rec.enable_real_time_streaming(stream_model, string_parts=True)

    # source only supplies sampling_rate here (listen_in_background is the
    # scripted feed)
    gen = rec.real_time_streaming(source=FakeSource(silence(0.1)))
    yields = []
    while True:
        is_last, out = next(gen)
        yields.append((is_last, out))
        if is_last:
            break
    rec.stream = False

    # expected: replay the accumulation against a fresh engine
    from danspeech_tpu.engine import DanSpeechRecognizer

    eng = DanSpeechRecognizer(model_name=stream_model)
    eng.enable_streaming(secondary_model=None, return_string_parts=True)
    expected = []
    acc = np.zeros(0, np.float32)
    first = True
    for is_last, c in script:
        acc = np.concatenate([acc, c])
        if first:
            if len(acc) >= first_req:
                out = eng.streaming_transcribe(acc, is_last=False, is_first=True)
                assert out == ""
                acc = np.zeros(0, np.float32)
                first = False
        elif is_last or len(acc) >= general_req:
            out = eng.streaming_transcribe(acc, is_last=is_last, is_first=False)
            if out:
                expected.append((is_last, out))
            acc = np.zeros(0, np.float32)

    assert yields == expected
    assert yields[-1][0] is True


def test_disable_real_time_streaming_restores(stream_model):
    rec = make_recognizer()
    feed = ScriptedFeed([])
    rec.listen_in_background = lambda source: (feed.stopper, feed.get_data)
    rec.enable_real_time_streaming(stream_model)
    assert rec.stream is True
    rec.stream_thread_stopper = feed.stopper
    rec.disable_real_time_streaming()
    assert rec.stream is False
    assert feed.stopped


# ---------------------------------------------------------------------------
# calibration + parameter setters (reference :717-818)
# ---------------------------------------------------------------------------


def test_adjust_for_speech_sets_threshold_from_average():
    wave = speech(4.5, seed=3)
    rec = make_recognizer()
    with FakeSource(wave) as src:
        rec.adjust_for_speech(src, duration=4)

    # replay: average chunk rms while elapsed <= duration, minus 80
    spb = CHUNK / RATE
    pcm = (np.clip(wave, -1, 1) * 32767).astype("<i2").tobytes()
    energies, elapsed, pos = [], 0.0, 0
    while True:
        elapsed += spb
        if elapsed > 4:
            break
        energies.append(rms(pcm[pos:pos + CHUNK * 2], 2))
        pos += CHUNK * 2
    avg = sum(energies) / len(energies)
    assert rec.energy_threshold == pytest.approx(avg - 80)


def test_adjust_for_ambient_noise_decays_on_silence():
    rec = make_recognizer()
    rec.energy_threshold = 1000
    with FakeSource(silence(2.5)) as src:
        rec.adjust_for_ambient_noise(src, duration=2)
    spb = CHUNK / RATE
    n_chunks = math.floor(2 / spb)
    damping = rec.dynamic_energy_adjustment_damping ** spb
    assert rec.energy_threshold == pytest.approx(1000 * damping ** n_chunks)


def test_update_stream_parameters():
    rec = make_recognizer()
    rec.update_stream_parameters(
        energy_threshold=123, pause_threshold=1.5,
        phrase_threshold=0.5, non_speaing_duration=0.4,
    )
    assert rec.energy_threshold == 123
    assert rec.pause_threshold == 1.5
    assert rec.phrase_threshold == 0.5
    assert rec.non_speaking_duration == 0.4
