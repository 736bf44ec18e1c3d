"""CTC prefix beam search + n-gram LM tests.

Correctness anchors:
- exhaustive CTC marginalization on tiny inputs (beam search with a wide
  beam must find the true most-likely label sequence with its exact score),
- hand-computed ARPA backoff chains,
- LM fusion flipping an acoustically ambiguous decision.
"""

import itertools
import math

import numpy as np
import pytest

from danspeech_tpu.decode.beam import BeamCTCDecoder, prefix_beam_search
from danspeech_tpu.decode.lm import NgramLM, PackedNgramLM, load_arpa

LABELS = "_ab "  # blank, a, b, space


def ctc_marginal(probs, labels_seq, blank=0):
    """True P(labels_seq) by summing all alignments (exponential; tiny T)."""
    t_max, n_classes = probs.shape
    total = 0.0
    for path in itertools.product(range(n_classes), repeat=t_max):
        # collapse path
        collapsed = []
        prev = blank
        for c in path:
            if c != blank and c != prev:
                collapsed.append(c)
            prev = c
        if tuple(collapsed) == tuple(labels_seq):
            p = 1.0
            for t, c in enumerate(path):
                p *= probs[t, c]
            total += p
    return total


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_beam_search_finds_exact_map_sequence(seed):
    rng = np.random.default_rng(seed)
    t_max, n_classes = 5, 4
    probs = rng.dirichlet(np.ones(n_classes), size=t_max)

    results = prefix_beam_search(probs, beam_width=1024, blank=0)
    best_prefix, best_score, _ = results[0]

    # exhaustive ground truth over all label sequences up to length T
    best_true, best_true_p = None, -1.0
    for ln in range(t_max + 1):
        for seq in itertools.product([1, 2, 3], repeat=ln):
            ok = all(seq[i] != seq[i + 1] for i in range(len(seq) - 1))
            # repeated labels are legal in CTC (need blank between); include all
            p = ctc_marginal(probs, seq)
            del ok
            if p > best_true_p:
                best_true_p, best_true = p, seq

    assert tuple(best_prefix) == tuple(best_true)
    assert math.isclose(math.exp(best_score), best_true_p, rel_tol=1e-6)


def test_beam_search_score_is_exact_marginal():
    rng = np.random.default_rng(7)
    probs = rng.dirichlet(np.ones(4), size=4)
    results = prefix_beam_search(probs, beam_width=4096, blank=0)
    for prefix, score, _ in results[:5]:
        true_p = ctc_marginal(probs, prefix)
        assert math.isclose(math.exp(score), true_p, rel_tol=1e-6), prefix


def test_peaked_probs_match_greedy():
    # peaked distributions: beam search == greedy collapse
    from danspeech_tpu.decode.greedy import GreedyDecoder

    rng = np.random.default_rng(3)
    t_max = 30
    path = rng.integers(0, len(LABELS), size=t_max)
    probs = np.full((t_max, len(LABELS)), 0.01)
    probs[np.arange(t_max), path] = 1 - 0.01 * (len(LABELS) - 1)

    dec = BeamCTCDecoder(LABELS, beam_width=16, blank_index=0)
    strings, offsets = dec.decode(probs[None], [t_max])
    greedy = GreedyDecoder(LABELS, blank_index=0)
    gstrings, goffsets = greedy.decode(probs[None], [t_max])
    assert strings[0][0] == gstrings[0][0]
    np.testing.assert_array_equal(offsets[0][0], goffsets[0][0])


ARPA = """\
\\data\\
ngram 1=5
ngram 2=3

\\1-grams:
-1.0\t<s>\t-0.5
-1.2\t</s>
-0.8\ta\t-0.3
-0.9\tab\t-0.4
-1.5\tb\t-0.2

\\2-grams:
-0.5\ta ab
-0.7\tab a
-1.1\ta b

\\end\\
"""


@pytest.fixture()
def arpa_lm(tmp_path):
    p = tmp_path / "tiny.arpa"
    p.write_text(ARPA)
    return load_arpa(str(p))


def test_arpa_loading_and_direct_hits(arpa_lm):
    ln10 = math.log(10)
    assert math.isclose(arpa_lm.score_word([], "a"), -0.8 * ln10, rel_tol=1e-9)
    assert math.isclose(arpa_lm.score_word(["a"], "ab"), -0.5 * ln10, rel_tol=1e-9)
    assert math.isclose(arpa_lm.score_word(["ab"], "a"), -0.7 * ln10, rel_tol=1e-9)


def test_arpa_backoff_chain(arpa_lm):
    ln10 = math.log(10)
    # p(b | ab): no bigram "ab b" -> backoff(ab) + p(b) = -0.4 + -1.5
    assert math.isclose(
        arpa_lm.score_word(["ab"], "b"), (-0.4 - 1.5) * ln10, rel_tol=1e-9
    )
    # OOV
    assert arpa_lm.score_word([], "zzz") == -1000.0


def test_packed_lm_matches_dict_lm(arpa_lm):
    packed = PackedNgramLM(arpa_lm)
    for ctx, w in [([], "a"), (["a"], "ab"), (["ab"], "b"), (["b"], "a"), ([], "zzz")]:
        assert math.isclose(
            packed.score_word(ctx, w), arpa_lm.score_word(ctx, w), rel_tol=1e-7
        ), (ctx, w)


def test_lm_flips_ambiguous_decision(tmp_path):
    """Acoustically 50/50 between 'a b' and 'a a'; LM prefers 'a b'."""
    arpa = """\\data\\
ngram 1=4
ngram 2=2

\\1-grams:
-0.5\ta\t-0.1
-0.5\tb\t-0.1
-2.0\t<s>\t-0.1
-2.0\t</s>

\\2-grams:
-0.05\ta b
-3.0\ta a

\\end\\
"""
    p = tmp_path / "flip.arpa"
    p.write_text(arpa)

    labels = "_ab "
    t_max = 5
    probs = np.zeros((t_max, 4))
    # frames: a, space, then ambiguous a/b, blank padding
    probs[0] = [0.02, 0.94, 0.02, 0.02]
    probs[1] = [0.02, 0.02, 0.02, 0.94]
    probs[2] = [0.02, 0.48, 0.48, 0.02]
    probs[3] = [0.94, 0.02, 0.02, 0.02]
    probs[4] = [0.94, 0.02, 0.02, 0.02]

    no_lm = BeamCTCDecoder(labels, beam_width=16, blank_index=0)
    with_lm = BeamCTCDecoder(
        labels, lm_path=str(p), alpha=1.5, beta=0.0, beam_width=16, blank_index=0
    )
    s_no, _ = no_lm.decode(probs[None], [t_max])
    s_lm, _ = with_lm.decode(probs[None], [t_max])
    # without LM the two candidates tie (either may win); with LM 'a b' must win
    assert s_lm[0][0] == "a b"
    assert s_no[0][0] in ("a a", "a b")


def test_beam_decode_batch_and_show_all(arpa_lm):
    rng = np.random.default_rng(9)
    probs = rng.dirichlet(np.ones(4), size=(2, 12))
    dec = BeamCTCDecoder(LABELS, beam_width=8, blank_index=0)
    strings, offsets = dec.decode(probs, [12, 9])
    assert len(strings) == 2
    assert len(strings[0]) <= 8
    for s, off in zip(strings[0], offsets[0]):
        assert len(s) == len(off)
