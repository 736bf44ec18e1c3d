"""On-device vectorized beam search vs the Python oracle (lm=None)."""

import numpy as np
import pytest

from danspeech_tpu.decode.beam import prefix_beam_search
from danspeech_tpu.decode.device_beam import DeviceBeamDecoder

LABELS = "_abcdefghijklmnopqrstuvwxyzæøåéü "


def oracle(probs, beam_width):
    res = prefix_beam_search(
        probs, beam_width=beam_width, blank=0,
        cutoff_top_n=len(LABELS), cutoff_prob=1.0, scorer=None,
    )
    return res


@pytest.mark.parametrize("seed,t", [(0, 12), (1, 25), (2, 40)])
def test_matches_oracle_top_beams(seed, t):
    rng = np.random.default_rng(seed)
    c = len(LABELS)
    probs = rng.dirichlet(np.ones(c) * 0.2, size=t).astype(np.float32)

    dec = DeviceBeamDecoder(LABELS, beam_width=16)
    strings, offsets = dec.decode(probs[None], np.array([t]))

    ref = oracle(probs, beam_width=16)
    ref_strings = ["".join(LABELS[c] for c in r[0]) for r in ref]
    ref_scores = [r[1] for r in ref]

    # top beam must match exactly; the tail can differ where scores tie
    assert strings[0][0] == ref_strings[0]
    # all oracle beams with clearly distinct scores must appear in order
    k = min(8, len(ref_strings))
    assert strings[0][:k] == ref_strings[:k]


def test_batched_rows_independent():
    rng = np.random.default_rng(3)
    c = len(LABELS)
    t = 20
    p1 = rng.dirichlet(np.ones(c) * 0.2, size=t).astype(np.float32)
    p2 = rng.dirichlet(np.ones(c) * 0.2, size=t).astype(np.float32)

    dec = DeviceBeamDecoder(LABELS, beam_width=8)
    both, _ = dec.decode(np.stack([p1, p2]), np.array([t, t]))
    solo1, _ = dec.decode(p1[None], np.array([t]))
    solo2, _ = dec.decode(p2[None], np.array([t]))
    assert both[0] == solo1[0]
    assert both[1] == solo2[0]


def test_length_masking():
    rng = np.random.default_rng(4)
    c = len(LABELS)
    t = 30
    p = rng.dirichlet(np.ones(c) * 0.2, size=t).astype(np.float32)
    dec = DeviceBeamDecoder(LABELS, beam_width=8)
    # decode row with length 18 inside a T=30 batch == standalone T=18
    padded, _ = dec.decode(p[None], np.array([18]))
    exact, _ = dec.decode(p[None, :18], np.array([18]))
    assert padded[0][0] == exact[0][0]


def test_times_are_increasing():
    rng = np.random.default_rng(5)
    c = len(LABELS)
    t = 25
    p = rng.dirichlet(np.ones(c) * 0.1, size=t).astype(np.float32)
    dec = DeviceBeamDecoder(LABELS, beam_width=8)
    strings, offsets = dec.decode(p[None], np.array([t]))
    off = offsets[0][0]
    assert len(off) == len(strings[0][0])
    assert all(int(a) < int(b) for a, b in zip(off, off[1:]))


def test_cutoff_top_n_matches_oracle():
    """Device-side cutoff_top_n (per-frame class cut before expansion) ==
    the Python oracle's cutoff, LM-free and LM-fused."""
    from danspeech_tpu.decode.beam import _LMScorer, prefix_beam_search
    from danspeech_tpu.decode.lm import NgramLM

    rng = np.random.default_rng(17)
    labels = LABELS
    space = labels.index(" ")
    t, c, k = 40, len(labels), 8
    probs = rng.dirichlet(np.ones(c) * 0.2, size=(1, t)).astype(np.float32)

    oracle = prefix_beam_search(
        probs[0], beam_width=12, blank=0, cutoff_top_n=k
    )
    oracle_best = "".join(labels[ch] for ch in oracle[0][0])
    dec = DeviceBeamDecoder(labels, beam_width=12, cutoff_top_n=k)
    strings, _ = dec.decode(probs)
    assert strings[0][0] == oracle_best

    lm = NgramLM(2)
    for w in ["hej", "med", "dig"]:
        lm.add_ngram((w,), float(rng.uniform(-2, -0.5)), -0.2)
    lm.add_ngram(("hej", "med"), -0.3)
    biased = np.full((1, t, c), 0.01, np.float32)
    text = "hej med dig "
    for ti in range(t):
        biased[0, ti, labels.index(text[ti % len(text)])] += 1.0
        biased[0, ti, 0] += 0.6
    biased /= biased.sum(-1, keepdims=True)
    scorer = _LMScorer(lm, labels, 1.0, 0.3, space)
    oracle = prefix_beam_search(
        biased[0], beam_width=12, blank=0, cutoff_top_n=k,
        scorer=scorer,
    )
    oracle_best = "".join(labels[ch] for ch in oracle[0][0])
    dec_lm = DeviceBeamDecoder(
        labels, beam_width=12, cutoff_top_n=k, lm=lm, alpha=1.0, beta=0.3
    )
    strings, _ = dec_lm.decode(biased)
    assert strings[0][0] == oracle_best
