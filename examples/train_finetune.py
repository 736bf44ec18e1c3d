"""Train or finetune a model from a CSV manifest — the gallery entry for
the training stack (the reference delegates this entire capability to its
external danspeech_training repo, docs_source/train.rst:8-13; here it is
part of the framework).

Manifest format: one ``wav_path,transcript`` per line (paths relative to
the manifest's directory; ``#`` comments and a ``file,...`` header are
allowed). 16 kHz WAVs.

Fresh model:
    python examples/train_finetune.py train.csv --val dev.csv \
        --epochs 20 --batch-size 32 --export model.dsz

Finetune a zoo checkpoint with the first 2 layers frozen (reference
freeze_layers semantics):
    python examples/train_finetune.py train.csv \
        --finetune-from DanSpeechPrimary.pth --freeze-layers 2

Equivalent module CLI: ``python -m danspeech_tpu.train --manifest ...``
(train/__main__.py — also exposes --rnn-type/--no-remat/... knobs).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("manifest", help="CSV manifest: wav_path,transcript")
    ap.add_argument("--val", default=None, help="validation manifest")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--hidden", type=int, default=800)
    ap.add_argument("--layers", type=int, default=5)
    ap.add_argument("--finetune-from", default=None,
                    help=".pth or .dsz checkpoint to start from")
    ap.add_argument("--freeze-layers", type=int, default=0)
    ap.add_argument("--checkpoint-dir", default="ckpts")
    ap.add_argument("--export", default=None)
    args = ap.parse_args()

    from danspeech_tpu.models.config import DeepSpeechConfig
    from danspeech_tpu.train import export_model, finetune, train

    if args.finetune_from:
        from danspeech_tpu.models import DeepSpeechModel

        model = DeepSpeechModel.load_model(args.finetune_from)
        state = finetune(
            model, args.manifest,
            freeze_layers=args.freeze_layers,
            epochs=args.epochs, batch_size=args.batch_size,
            learning_rate=args.lr, val_manifest=args.val,
            checkpoint_dir=args.checkpoint_dir,
        )
        config = model.config
    else:
        config = DeepSpeechConfig(
            model_name="finetune-example",
            rnn_hidden_size=args.hidden, rnn_layers=args.layers,
            conv_layers=2,
        )
        state = train(
            config, args.manifest,
            epochs=args.epochs, batch_size=args.batch_size,
            learning_rate=args.lr, val_manifest=args.val,
            checkpoint_dir=args.checkpoint_dir,
        )
    if args.export:
        print("exported", export_model(state, config, args.export))


if __name__ == "__main__":
    main()
