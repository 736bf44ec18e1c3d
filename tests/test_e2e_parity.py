"""End-to-end transcript + WER parity: full reference stack vs ours, all 13
example files, greedy AND LM beam decode (VERDICT r1 item 2).

The reference stack is rebuilt from its published semantics on a shared
random checkpoint: scipy-loaded waveforms
(/root/reference/danspeech/audio/resources.py:64-82), librosa-semantics
center-padded STFT + log1p + mean/std normalize (parsers.py:50-72), the
torch acoustic graph (test_model_parity.torch_forward), the greedy
collapse loop (decoder.py:166-181), and ctcdecode-semantics prefix beam
search with word-boundary LM fusion (decoder.py:96-144, here the host
decoder whose C++/Python parity is pinned in test_native_beam.py).

Ours is the public package surface only: Recognizer.recognize_batch and
the engine's decoders, plus the on-device LM beam. Any numeric drift that
changes a single character in any transcript fails; corpus WER between
the stacks is pinned to exactly 0.
"""

import numpy as np
import pytest

from danspeech_tpu import Recognizer
from danspeech_tpu.audio import load_audio
from danspeech_tpu.decode.beam import BeamCTCDecoder
from danspeech_tpu.decode.device_beam import DeviceBeamDecoder
from danspeech_tpu.decode.lm import NgramLM
from danspeech_tpu.decode.metrics import wer
from danspeech_tpu.models import DeepSpeechModel
from danspeech_tpu.models.config import DeepSpeechConfig

from test_model_parity import randomize_bn, torch_forward
from test_stft import numpy_librosa_stft

ALPHA, BETA, BEAM_W = 1.3, 0.2, 16


def _corpus_wer(hyps, refs):
    """Corpus WER: summed word edit distance / total reference words."""
    dist = sum(wer(h, r) for h, r in zip(hyps, refs))
    n = sum(len(r.split()) for r in refs)
    return dist / max(n, 1)


@pytest.fixture(scope="module")
def model():
    """Shared random checkpoint, shaped like the reference's TestModel
    family and nudged to emit varied multi-word transcripts (a plain random
    init collapses to a single repeated char, which would make the beam/LM
    comparisons vacuous): the fc weight is sharpened 3x plus a small
    deterministic perturbation — seed 33 with this tweak empirically yields
    17 distinct words incl. spaces across the corpus."""
    import jax.numpy as jnp

    config = DeepSpeechConfig(
        model_name="e2e-parity", rnn_hidden_size=96, rnn_layers=2, conv_layers=2
    )
    m = DeepSpeechModel.init_random(config, seed=33)
    m.params = randomize_bn(m.params, seed=34)
    fc = m.params["fc"]
    weight = np.asarray(fc.weight).copy() * 3.0  # (classes, hidden)
    space = config.labels.index(" ")
    weight[:, space] += 0.08 * np.abs(
        np.random.default_rng(33).normal(size=weight.shape[0])
    )
    m.params = {**m.params, "fc": fc._replace(weight=jnp.asarray(weight))}
    return m


@pytest.fixture(scope="module")
def waveforms(example_wavs):
    assert len(example_wavs) == 13
    return [load_audio(p) for p in example_wavs]


def _ref_greedy(probs_row, labels):
    """Reference GreedyDecoder semantics (decoder.py:166-181)."""
    path = probs_row.argmax(axis=-1)
    out = []
    for i, k in enumerate(path):
        ch = labels[k]
        if ch != "_" and not (i and k == path[i - 1]):
            out.append(ch)
    return "".join(out)


@pytest.fixture(scope="module")
def reference_probs(model, waveforms):
    """Reference-stack acoustic probabilities per file (torch, batch=1 like
    DanSpeechRecognizer.py:220)."""
    out = []
    for w in waveforms:
        spect = np.log1p(numpy_librosa_stft(w)).astype(np.float32)
        spect = (spect - spect.mean()) / spect.std(ddof=1)
        x = spect[None, None]
        probs, lens = torch_forward(model.params, model.config, x, [x.shape[3]])
        out.append(probs[0, : lens[0]])
    return out


@pytest.fixture(scope="module")
def reference_greedy(reference_probs, model):
    return [_ref_greedy(p, model.config.labels) for p in reference_probs]


@pytest.fixture(scope="module")
def synthetic_lm(reference_greedy):
    """Bigram LM over the words the checkpoint actually emits, plus noise
    words — strong enough to change beam decisions at alpha=1.3."""
    rng = np.random.default_rng(5)
    words = sorted({w for s in reference_greedy for w in s.split() if w})
    assert len(words) >= 10, "greedy transcripts too short to build an LM"
    lm = NgramLM(2)
    for w in words:
        lm.add_ngram((w,), float(rng.uniform(-2.0, -0.3)), float(rng.uniform(-0.8, 0)))
    for _ in range(len(words) * 4):
        pair = tuple(words[i] for i in rng.integers(0, len(words), 2))
        if pair not in lm.tables[1]:
            lm.add_ngram(pair, float(rng.uniform(-1.5, -0.1)))
    return lm


def test_greedy_transcripts_match_reference_stack(
    model, waveforms, reference_greedy
):
    recognizer = Recognizer(model=model)
    ours = recognizer.recognize_batch(waveforms)
    assert ours == reference_greedy
    assert _corpus_wer(ours, reference_greedy) == 0.0


def test_greedy_single_path_matches_batch(model, waveforms, reference_greedy):
    """recognize() (batch-1 like the reference) == reference, per file."""
    recognizer = Recognizer(model=model)
    for w, ref in zip(waveforms[:3], reference_greedy[:3]):
        assert recognizer.recognize(w) == ref


def test_lm_beam_transcripts_match_reference_stack(
    model, waveforms, reference_probs, synthetic_lm, reference_greedy
):
    labels = model.config.labels
    decoder = BeamCTCDecoder(
        labels,
        lm_path=synthetic_lm,
        alpha=ALPHA,
        beta=BETA,
        beam_width=BEAM_W,
        num_processes=6,
        blank_index=labels.index("_"),
    )

    # reference stack: torch probabilities through the LM beam decoder
    ref_strings = []
    for p in reference_probs:
        s, _ = decoder.decode(p[None])
        ref_strings.append(s[0][0])

    # the LM must actually be changing decisions, else this test is vacuous
    assert ref_strings != reference_greedy

    # our stack: public API with the LM decoder
    recognizer = Recognizer(model=model, lm=synthetic_lm, alpha=ALPHA, beta=BETA)
    recognizer.update_decoder(beam_width=BEAM_W)
    ours = recognizer.recognize_batch(waveforms)

    assert ours == ref_strings
    assert _corpus_wer(ours, ref_strings) == 0.0


def test_device_lm_beam_matches_reference_stack(
    model, waveforms, reference_probs, synthetic_lm
):
    """The fully on-device LM-fused beam (decode/device_lm.py) reproduces
    the reference-stack transcripts end-to-end."""
    labels = model.config.labels
    host = BeamCTCDecoder(
        labels, lm_path=synthetic_lm, alpha=ALPHA, beta=BETA,
        beam_width=BEAM_W, blank_index=labels.index("_"),
    )
    dev = DeviceBeamDecoder(
        labels, beam_width=BEAM_W, lm=synthetic_lm, alpha=ALPHA, beta=BETA,
        blank_index=labels.index("_"),
    )

    recognizer = Recognizer(model=model)
    probs, out_lens = recognizer.danspeech_recognizer._run_acoustic_batch(
        waveforms
    )

    hs, _ = host.decode(probs, out_lens)
    ds, _ = dev.decode(probs, out_lens)
    assert [d[0] for d in ds] == [h[0] for h in hs]

    # and against the reference (torch) acoustic stack
    ref_strings = []
    for p in reference_probs:
        s, _ = host.decode(p[None])
        ref_strings.append(s[0][0])
    assert [d[0] for d in ds] == ref_strings


@pytest.fixture(scope="module")
def order5_trie_path(tmp_path_factory, reference_greedy):
    """Order-5 LM over the checkpoint's emitted words, serialized to a
    KenLM trie .klm file on disk — the zoo's dsl_5gram class
    (/root/reference/danspeech/language_models/dsl_5gram.py)."""
    from danspeech_tpu.decode.kenlm_trie import write_kenlm_trie

    rng = np.random.default_rng(7)
    words = sorted({w for s in reference_greedy for w in s.split() if w})
    assert len(words) >= 10
    lm = NgramLM(5)
    for w in words:
        lm.add_ngram((w,), float(rng.uniform(-2.0, -0.3)), float(rng.uniform(-0.8, 0)))
    for n, count in ((2, 6), (3, 5), (4, 4), (5, 3)):
        for _ in range(len(words) * count):
            gram = tuple(words[i] for i in rng.integers(0, len(words), n))
            if gram not in lm.tables[n - 1]:
                backoff = float(rng.uniform(-0.5, 0)) if n < 5 else 0.0
                lm.add_ngram(gram, float(rng.uniform(-1.5, -0.1)), backoff)
    path = tmp_path_factory.mktemp("lm") / "order5.klm"
    write_kenlm_trie(lm, str(path))
    return str(path)


def test_flagship_settings_trie_file_device_beam(
    model, waveforms, order5_trie_path
):
    """The whole flagship chain at reference defaults (alpha=1.3, beta=0.2,
    beam=64, cutoff_top_n=40): a trie .klm FILE on disk -> load_lm ->
    device hash-table pack -> on-device beam 64 through the PUBLIC API,
    against the host C++ decoder and the reference (torch) acoustic stack
    (DanSpeechRecognizer.py:88-92 + decoder.py:96-144 defaults).

    Waveforms are clipped to 3 s: at beam 64 over full-length files the
    host (f64) and device (f32) stacks accumulate enough rounding to flip
    near-tied prunes in long space-free stretches — 3 s keeps the
    comparison char-exact while still driving every stage end-to-end."""
    labels = model.config.labels
    clips = [w[: 3 * 16000] for w in waveforms]
    host = BeamCTCDecoder(
        labels, lm_path=order5_trie_path, alpha=1.3, beta=0.2,
        beam_width=64, num_processes=6, blank_index=labels.index("_"),
    )

    # reference stack: torch probabilities (batch=1 like the reference)
    # through the host LM beam
    ref_strings, ref_greedy = [], []
    for w in clips:
        spect = np.log1p(numpy_librosa_stft(w)).astype(np.float32)
        spect = (spect - spect.mean()) / spect.std(ddof=1)
        x = spect[None, None]
        probs, lens = torch_forward(model.params, model.config, x, [x.shape[3]])
        p = probs[0, : lens[0]]
        s, _ = host.decode(p[None])
        ref_strings.append(s[0][0])
        ref_greedy.append(_ref_greedy(p, labels))
    # the 5-gram must actually be changing decisions vs greedy
    assert ref_strings != ref_greedy

    # our stack: public API, device backend (engine._device_lm converts
    # the trie via to_ngram_lm and packs it into HBM tables)
    recognizer = Recognizer(
        model=model, lm=order5_trie_path, alpha=1.3, beta=0.2
    )
    recognizer.update_decoder(beam_width=64, backend="device")
    ours = recognizer.recognize_batch(clips)

    assert ours == ref_strings
    assert _corpus_wer(ours, ref_strings) == 0.0
