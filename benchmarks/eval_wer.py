"""WER/CER + throughput eval harness.

The reference keeps its test-set script in an external training repo
(docs_source/train.rst:11-13) and only publishes WER numbers
(danspeech.rst:49-51). This harness makes the measurement reproducible in
this repo: given a manifest of (wav path, reference transcript) pairs, it
batch-transcribes data-parallel and reports corpus WER, CER, and
audio-seconds/s.

Manifest format: one ``<wav-path>\t<transcript>`` per line (or a directory
of .wav files with sibling .txt transcripts).

Usage:
  python benchmarks/eval_wer.py manifest.tsv [--model TestModel]
      [--lm DSL3gram --alpha 1.3 --beta 0.2 --beam 64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def edit_distance(a: list, b: list) -> int:
    """Pure-numpy Levenshtein (replaces the reference's python-Levenshtein C
    extension, decoder.py:19; SURVEY §2.2 N6)."""
    prev = np.arange(len(b) + 1)
    for i, x in enumerate(a, 1):
        cur = np.empty(len(b) + 1, dtype=np.int64)
        cur[0] = i
        for j, y in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (x != y))
        prev = cur
    return int(prev[-1])


def read_manifest(path: str):
    pairs = []
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            if name.endswith(".wav"):
                txt = os.path.join(path, name[:-4] + ".txt")
                if os.path.exists(txt):
                    with open(txt) as f:
                        pairs.append((os.path.join(path, name), f.read().strip()))
    else:
        with open(path) as f:
            for line in f:
                if "\t" in line:
                    wav, text = line.rstrip("\n").split("\t", 1)
                    pairs.append((wav, text))
    if not pairs:
        raise SystemExit(f"no (wav, transcript) pairs found in {path}")
    return pairs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("manifest")
    ap.add_argument("--model", default="TestModel")
    ap.add_argument("--model-path", help=".pth or native checkpoint path")
    ap.add_argument("--lm")
    ap.add_argument("--alpha", type=float, default=1.3)
    ap.add_argument("--beta", type=float, default=0.2)
    ap.add_argument("--beam", type=int, default=64)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    from danspeech_tpu import Recognizer
    from danspeech_tpu.audio import load_audio
    from danspeech_tpu.models import DeepSpeechModel
    from danspeech_tpu.utils.logging import get_logger, metrics

    log = get_logger("danspeech_tpu.eval")

    if args.model_path:
        model = DeepSpeechModel.load_model(args.model_path)
    else:
        import danspeech_tpu.pretrained_models as zoo

        model = getattr(zoo, args.model)()

    kwargs = {}
    if args.lm:
        import danspeech_tpu.language_models as lms

        kwargs = dict(
            lm=getattr(lms, args.lm)(), alpha=args.alpha, beta=args.beta,
            beam_width=args.beam,
        )
    recognizer = Recognizer(model=model, **kwargs)

    pairs = read_manifest(args.manifest)
    word_errs = word_tot = char_errs = char_tot = 0
    audio_s = 0.0
    t0 = time.perf_counter()
    for i in range(0, len(pairs), args.batch):
        chunk = pairs[i : i + args.batch]
        waves = [load_audio(w) for w, _ in chunk]
        audio_s += sum(len(w) for w in waves) / 16000.0
        hyps = recognizer.recognize_batch(waves)
        for (wav, ref), hyp in zip(chunk, hyps):
            rw, hw = ref.split(), hyp.split()
            word_errs += edit_distance(hw, rw)
            word_tot += len(rw)
            char_errs += edit_distance(list(hyp), list(ref))
            char_tot += len(ref)
    wall = time.perf_counter() - t0

    wer = 100.0 * word_errs / max(word_tot, 1)
    cer = 100.0 * char_errs / max(char_tot, 1)
    metrics(
        log, "eval", utterances=len(pairs), wer_pct=wer, cer_pct=cer,
        audio_s=audio_s, wall_s=wall, audio_s_per_s=audio_s / wall,
    )
    print(
        f"WER {wer:.2f}%  CER {cer:.2f}%  "
        f"({len(pairs)} utts, {audio_s:.1f}s audio, {audio_s / wall:.1f} audio-s/s)"
    )


if __name__ == "__main__":
    main()
