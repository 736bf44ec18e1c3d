"""On-device LM fusion: scoring + LM-fused beam search parity vs the host
oracle (decode/beam.py) and the native C++ decoder (native/ctcbeam).

This is the SURVEY §2.2 N2/N3 completion check: the reference's
ctcdecode+KenLM configuration (decoder.py:96-144) decoded entirely on
device must produce the host decoders' transcripts and scores.
"""

import math

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from danspeech_tpu.decode.beam import BeamCTCDecoder, _LMScorer, prefix_beam_search
from danspeech_tpu.decode.device_beam import DeviceBeamDecoder
from danspeech_tpu.decode.device_lm import (
    boundary_scores,
    init_lm_state,
    lookup_word_ids,
    pack_device_lm,
    score_word_ids,
    _h_word,
)
from danspeech_tpu.decode.lm import NgramLM

LABELS = "_abcdefghijklmnopqrstuvwxyz "
SPACE = LABELS.index(" ")


def _random_lm(rng, order=3, n_words=30, max_len=5):
    """Random backoff LM over words spellable in LABELS."""
    lm = NgramLM(order)
    chars = LABELS[1:-1]
    words = set()
    while len(words) < n_words:
        n = rng.integers(1, max_len + 1)
        words.add("".join(chars[i] for i in rng.integers(0, len(chars), n)))
    words = sorted(words)
    for w in words:
        lm.add_ngram((w,), float(rng.uniform(-4, -0.5)), float(rng.uniform(-1, 0)))
    for _ in range(n_words * 3):
        pair = tuple(words[i] for i in rng.integers(0, n_words, 2))
        lm.add_ngram(pair, float(rng.uniform(-3, -0.2)), float(rng.uniform(-1, 0)))
    if order >= 3:
        for _ in range(n_words * 3):
            tri = tuple(words[i] for i in rng.integers(0, n_words, 3))
            lm.add_ngram(tri, float(rng.uniform(-2, -0.1)))
    return lm, words


@pytest.mark.parametrize("order", [2, 3, 5])
def test_score_word_ids_matches_host(order):
    rng = np.random.default_rng(0)
    lm, words = _random_lm(rng, order=order)
    if order >= 4:  # add some high-order n-grams (zoo ships 5-grams)
        ids = list(range(len(lm.words)))
        for _ in range(60):
            tup = tuple(lm.words[i] for i in rng.choice(ids, order))
            lm.add_ngram(tup, float(rng.uniform(-2, -0.1)))
        for _ in range(60):
            tup = tuple(lm.words[i] for i in rng.choice(ids, order - 1))
            if tup not in lm.tables[order - 2]:
                lm.add_ngram(tup, float(rng.uniform(-2, -0.1)), float(rng.uniform(-1, 0)))
    dlm = pack_device_lm(lm, LABELS)

    ctxs, wids, expected = [], [], []
    n_vocab = len(lm.words)
    for _ in range(300):
        # random context with absent (-1) slots; random word incl. OOV (-1)
        ctx = [
            int(rng.integers(0, n_vocab)) if rng.random() < 0.7 else -1
            for _ in range(lm.order - 1)
        ]
        wid = int(rng.integers(0, n_vocab)) if rng.random() < 0.9 else -1
        host = (
            lm.score_word_ids(tuple(c for c in ctx if c >= 0), wid)
            if wid >= 0
            else -1000.0
        )
        ctxs.append(ctx)
        wids.append(wid)
        expected.append(host)

    got = np.asarray(
        score_word_ids(dlm, jnp.asarray(ctxs, jnp.int32), jnp.asarray(wids, jnp.int32))
    )
    np.testing.assert_allclose(got, np.asarray(expected), rtol=1e-5, atol=1e-5)


def test_vocab_lookup_roundtrip():
    rng = np.random.default_rng(1)
    lm, words = _random_lm(rng, order=2)
    dlm = pack_device_lm(lm, LABELS)
    char_index = {ch: i for i, ch in enumerate(LABELS)}

    h1s, h2s, expected = [], [], []
    for w in words:
        h1, h2 = _h_word([char_index[c] for c in w])
        h1s.append(h1)
        h2s.append(h2)
        expected.append(lm.vocab[w])
    # plus some unknown words
    for w in ["zzzzzz", "qqq", "xoxo"]:
        if w in lm.vocab:
            continue
        h1, h2 = _h_word([char_index[c] for c in w])
        h1s.append(h1)
        h2s.append(h2)
        expected.append(-1)

    got = np.asarray(
        lookup_word_ids(
            dlm, jnp.asarray(h1s, jnp.uint32), jnp.asarray(h2s, jnp.uint32)
        )
    )
    np.testing.assert_array_equal(got, np.asarray(expected))


def test_boundary_scores_empty_word_is_zero():
    rng = np.random.default_rng(2)
    lm, _ = _random_lm(rng, order=2, n_words=5)
    dlm = pack_device_lm(lm, LABELS)
    state = init_lm_state(1, 4, lm.order)
    bscore, wid = boundary_scores(dlm, state, alpha=2.0, beta=0.5)
    np.testing.assert_array_equal(np.asarray(bscore), 0.0)
    np.testing.assert_array_equal(np.asarray(wid), -1)


def _lm_probs(rng, t_max, bias_words, labels=LABELS):
    """Probability stream biased towards spelling real words, so the LM
    actually changes decisions (pure noise rarely emits spaces)."""
    c = len(labels)
    text = " ".join(bias_words)
    probs = np.full((t_max, c), 0.02, np.float64)
    for t in range(t_max):
        ch = text[(t // 2) % len(text)]
        probs[t, labels.index(ch)] += rng.uniform(0.5, 2.0)
        probs[t, 0] += rng.uniform(0.0, 1.5)  # blank mass
        probs[t] += rng.uniform(0, 0.05, c)
    probs /= probs.sum(-1, keepdims=True)
    return probs.astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_device_beam_lm_matches_host_oracle(seed):
    rng = np.random.default_rng(seed)
    lm, words = _random_lm(rng, order=3, n_words=20)
    alpha, beta = 1.3, 0.4

    probs = _lm_probs(rng, 60, [words[i] for i in rng.integers(0, len(words), 4)])

    scorer = _LMScorer(lm, LABELS, alpha, beta, SPACE)
    host = prefix_beam_search(
        probs, beam_width=16, blank=0, scorer=scorer
    )
    host_best = "".join(LABELS[c] for c in host[0][0])

    dec = DeviceBeamDecoder(LABELS, beam_width=16, lm=lm, alpha=alpha, beta=beta)
    strings, _ = dec.decode(probs[None])
    assert strings[0][0] == host_best

    # scores of the shared top hypotheses agree (fp32 vs f64 tolerance)
    dev_scores = {}
    labels_arr, times, lens, scores = __import__(
        "danspeech_tpu.decode.device_beam", fromlist=["ctc_beam_search_device"]
    ).ctc_beam_search_device(
        jnp.asarray(probs[None]),
        jnp.asarray([probs.shape[0]], jnp.int32),
        beam_width=16,
        blank=0,
        lm=dec.lm,
        alpha=alpha,
        beta=beta,
        space=SPACE,
    )
    labels_arr = np.asarray(labels_arr)
    lens_np = np.asarray(lens)
    scores_np = np.asarray(scores)
    for k in range(16):
        s = "".join(LABELS[c] for c in labels_arr[0, k, : lens_np[0, k]])
        dev_scores.setdefault(s, float(scores_np[0, k]))
    host_scores = {
        "".join(LABELS[c] for c in pref): sc for pref, sc, _ in host
    }
    shared = set(dev_scores) & set(host_scores)
    assert len(shared) >= 5
    for s in shared:
        assert math.isfinite(dev_scores[s])
        np.testing.assert_allclose(dev_scores[s], host_scores[s], rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("seed", [3, 4])
def test_device_beam_lm_matches_native(seed):
    rng = np.random.default_rng(seed)
    lm, words = _random_lm(rng, order=2, n_words=15)
    alpha, beta = 0.8, 1.2
    probs = _lm_probs(rng, 48, [words[i] for i in rng.integers(0, len(words), 3)])

    host = BeamCTCDecoder(
        LABELS, lm_path=lm, alpha=alpha, beta=beta, beam_width=16, blank_index=0
    )
    hs, _ = host.decode(probs[None])

    dev = DeviceBeamDecoder(LABELS, beam_width=16, lm=lm, alpha=alpha, beta=beta)
    ds, _ = dev.decode(probs[None])
    assert ds[0][0] == hs[0][0]


def test_device_beam_lm_none_unchanged():
    """lm=None must behave exactly like the round-1 decoder."""
    rng = np.random.default_rng(7)
    probs = rng.dirichlet(np.ones(len(LABELS)), size=(2, 40)).astype(np.float32)
    a = DeviceBeamDecoder(LABELS, beam_width=8)
    b = DeviceBeamDecoder(LABELS, beam_width=8, lm=None)
    sa, _ = a.decode(probs)
    sb, _ = b.decode(probs)
    assert sa == sb
