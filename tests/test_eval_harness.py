"""Eval harness units: manifest parsing + numpy edit distance."""

import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "eval_wer", os.path.join(REPO, "benchmarks", "eval_wer.py")
)
eval_wer = importlib.util.module_from_spec(spec)
spec.loader.exec_module(eval_wer)


@pytest.mark.parametrize(
    "a,b,d",
    [
        ("kitten", "sitting", 3),
        ("", "abc", 3),
        ("abc", "", 3),
        ("same", "same", 0),
        ("hej med dig", "hej mad dig", 1),
    ],
)
def test_edit_distance_chars(a, b, d):
    assert eval_wer.edit_distance(list(a), list(b)) == d


def test_edit_distance_words():
    assert eval_wer.edit_distance("a b c".split(), "a x c".split()) == 1
    assert eval_wer.edit_distance("a b".split(), "a b c".split()) == 1


def test_manifest_tsv(tmp_path):
    m = tmp_path / "m.tsv"
    m.write_text("/x/a.wav\thej med dig\n/x/b.wav\tgodmorgen\n")
    pairs = eval_wer.read_manifest(str(m))
    assert pairs == [("/x/a.wav", "hej med dig"), ("/x/b.wav", "godmorgen")]


def test_manifest_dir(tmp_path):
    (tmp_path / "u1.wav").write_bytes(b"RIFF")
    (tmp_path / "u1.txt").write_text("hej\n")
    (tmp_path / "u2.wav").write_bytes(b"RIFF")  # no transcript: skipped
    pairs = eval_wer.read_manifest(str(tmp_path))
    assert pairs == [(str(tmp_path / "u1.wav"), "hej")]


def test_manifest_empty_errors(tmp_path):
    with pytest.raises(SystemExit):
        eval_wer.read_manifest(str(tmp_path))
