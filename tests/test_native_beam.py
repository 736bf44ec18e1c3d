"""Native C++ beam decoder equivalence vs the Python oracle."""

import math

import numpy as np
import pytest

from danspeech_tpu.decode.beam import BeamCTCDecoder, prefix_beam_search, _LMScorer
from danspeech_tpu.decode.lm import load_arpa

LABELS = "_ab "

try:
    from danspeech_tpu.decode.native_beam import NativeBeamDecoder

    NATIVE_OK = True
except Exception:  # build failure
    NATIVE_OK = False

pytestmark = pytest.mark.skipif(not NATIVE_OK, reason="native decoder unavailable")


ARPA = """\\data\\
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


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_native_matches_python_no_lm(seed):
    rng = np.random.default_rng(seed)
    probs = rng.dirichlet(np.ones(4), size=25).astype(np.float32)
    py = prefix_beam_search(probs, beam_width=16, blank=0)
    nat = NativeBeamDecoder(LABELS, beam_width=16, blank_index=0).decode(probs)

    assert len(nat) == len(py)
    for (pl, ps, pt), (nl, ns, nt) in zip(py, nat):
        assert tuple(pl) == tuple(nl)
        assert math.isclose(ps, ns, rel_tol=1e-5, abs_tol=1e-5)
        assert tuple(pt) == tuple(nt)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_matches_python_with_lm(tmp_path, seed):
    p = tmp_path / "tiny.arpa"
    p.write_text(ARPA)
    lm = load_arpa(str(p))

    rng = np.random.default_rng(seed + 10)
    probs = rng.dirichlet(np.ones(4) * 0.5, size=30).astype(np.float32)

    scorer = _LMScorer(lm, LABELS, alpha=1.3, beta=0.2, space_index=3)
    py = prefix_beam_search(probs, beam_width=12, blank=0, scorer=scorer)
    nat = NativeBeamDecoder(
        LABELS, lm=lm, alpha=1.3, beta=0.2, beam_width=12, blank_index=0
    ).decode(probs)

    assert len(nat) == len(py)
    for (pl, ps, pt), (nl, ns, nt) in zip(py, nat):
        assert tuple(pl) == tuple(nl)
        assert math.isclose(ps, ns, rel_tol=1e-4, abs_tol=1e-4)


def test_native_cutoffs_match_python():
    rng = np.random.default_rng(5)
    probs = rng.dirichlet(np.ones(4), size=20).astype(np.float32)
    py = prefix_beam_search(
        probs, beam_width=8, blank=0, cutoff_top_n=2, cutoff_prob=0.95
    )
    nat = NativeBeamDecoder(
        LABELS, beam_width=8, cutoff_top_n=2, cutoff_prob=0.95, blank_index=0
    ).decode(probs)
    assert tuple(py[0][0]) == tuple(nat[0][0])
    assert math.isclose(py[0][1], nat[0][1], rel_tol=1e-5, abs_tol=1e-5)


def test_beam_decoder_uses_native_and_threads(tmp_path):
    """BeamCTCDecoder should pick the native backend and thread over a batch."""
    rng = np.random.default_rng(6)
    probs = rng.dirichlet(np.ones(4), size=(6, 40)).astype(np.float32)
    dec = BeamCTCDecoder(LABELS, beam_width=8, num_processes=4, blank_index=0)
    assert dec._native is not None
    strings, offsets = dec.decode(probs, [40, 35, 30, 40, 20, 10])
    assert len(strings) == 6
    # cross-check one row against python
    py = prefix_beam_search(probs[1, :35], beam_width=8, blank=0)
    expected = "".join(LABELS[c] for c in py[0][0])
    assert strings[1][0] == expected


def test_beam_decoder_native_with_trie_klm(tmp_path):
    """A trie .klm keeps the native C++ path: the decoder converts the
    walkable trie model to an NgramLM for the native packer instead of
    silently falling back to the pure-Python oracle (code-review r4)."""
    from danspeech_tpu.decode.kenlm_trie import write_kenlm_trie

    p = tmp_path / "tiny.arpa"
    p.write_text(ARPA)
    lm = load_arpa(str(p))
    tpath = str(tmp_path / "model_trie.klm")
    write_kenlm_trie(lm, tpath)

    dec = BeamCTCDecoder(
        LABELS, lm_path=tpath, alpha=0.8, beta=0.2, beam_width=8,
        blank_index=0,
    )
    assert dec._native is not None

    # same transcripts as an ARPA-backed decoder on the same data
    ref = BeamCTCDecoder(
        LABELS, lm_path=lm, alpha=0.8, beta=0.2, beam_width=8, blank_index=0
    )
    rng = np.random.default_rng(11)
    probs = rng.dirichlet(np.ones(len(LABELS)), size=(3, 30)).astype(np.float32)
    assert dec.decode(probs)[0] == ref.decode(probs)[0]
