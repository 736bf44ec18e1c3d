"""Greedy decoder + metrics tests (reference decoder.py parity)."""

import numpy as np
import pytest

from danspeech_tpu.decode.greedy import (
    GreedyDecoder,
    collapse_batch,
    collapse_sequence,
)
from danspeech_tpu.decode.metrics import cer, levenshtein, wer

LABELS = "_abcdefghijklmnopqrstuvwxyzæøåéü "


def test_levenshtein_matches_bruteforce():
    import itertools

    def slow(a, b):
        dp = np.zeros((len(a) + 1, len(b) + 1), dtype=int)
        dp[:, 0] = np.arange(len(a) + 1)
        dp[0, :] = np.arange(len(b) + 1)
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                dp[i, j] = min(
                    dp[i - 1, j] + 1,
                    dp[i, j - 1] + 1,
                    dp[i - 1, j - 1] + (a[i - 1] != b[j - 1]),
                )
        return dp[-1, -1]

    rng = np.random.default_rng(0)
    alphabet = "abcd"
    for _ in range(200):
        a = "".join(rng.choice(list(alphabet), size=rng.integers(0, 8)))
        b = "".join(rng.choice(list(alphabet), size=rng.integers(0, 8)))
        assert levenshtein(a, b) == slow(a, b), (a, b)


def test_wer_cer_reference_semantics():
    # raw distances, not rates (reference decoder.py:45-74)
    assert wer("hej med dig", "hej med dig") == 0
    assert wer("hej med dig", "hej uden dig") == 1
    assert wer("en to tre", "en tre") == 1
    assert cer("abc", "abd") == 1
    assert cer("a b c", "abc") == 0  # spaces stripped


def test_collapse_sequence():
    # blank=0; "aa_ab_" -> "aab"
    seq = np.array([1, 1, 0, 1, 2, 0])
    s, off = collapse_sequence(seq, 6, LABELS, 0)
    assert s == "aab"
    np.testing.assert_array_equal(off, [0, 3, 4])


def test_collapse_batch_matches_per_row():
    """The whole-matrix serving collapse equals per-row collapse_sequence
    for random paths, varying sizes, uint8 dtype, and edge rows."""
    rng = np.random.default_rng(7)
    batch, t = 9, 50
    paths = rng.integers(0, len(LABELS), size=(batch, t)).astype(np.uint8)
    paths[3] = 0  # all blanks
    paths[4] = 5  # one long repeat
    sizes = np.array([50, 1, 0, 50, 37, 13, 50, 2, 49])
    got = collapse_batch(paths, sizes, LABELS, 0)
    want = [
        collapse_sequence(paths[b], int(sizes[b]), LABELS, 0)[0]
        for b in range(batch)
    ]
    assert got == want


def test_greedy_decoder_against_reference_loop():
    """Pin the vectorized collapse against a frame-loop reimplementation of
    process_string (reference decoder.py:166-181)."""
    rng = np.random.default_rng(3)
    batch, t, c = 3, 40, len(LABELS)
    probs = rng.random((batch, t, c)).astype(np.float32)
    sizes = [40, 33, 17]

    dec = GreedyDecoder(LABELS, blank_index=0)
    strings, offsets = dec.decode(probs, sizes)

    paths = probs.argmax(axis=2)
    for b in range(batch):
        expected = ""
        expected_off = []
        for i in range(sizes[b]):
            ch = LABELS[paths[b, i]]
            if ch != "_":
                if i != 0 and ch == LABELS[paths[b, i - 1]]:
                    continue
                expected += ch
                expected_off.append(i)
        assert strings[b][0] == expected
        np.testing.assert_array_equal(offsets[b][0], expected_off)


def test_greedy_decoder_empty_and_all_blank():
    dec = GreedyDecoder(LABELS, blank_index=0)
    probs = np.zeros((1, 5, len(LABELS)), dtype=np.float32)
    probs[:, :, 0] = 1.0  # all blank
    strings, offsets = dec.decode(probs, [5])
    assert strings == [[""]]
    assert offsets[0][0].size == 0
