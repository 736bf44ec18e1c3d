"""Training stack (beyond-reference: the reference outsources training to
the external danspeech_training repo, docs_source/train.rst:11-13).

Public surface:

- :mod:`.data` — manifest -> length-bucketed padded waveform batches
- :mod:`.step` — jitted CTC train steps (spectrogram- and waveform-level)
- :mod:`.loop` — epoch loop + train / finetune / continue wrappers
- :mod:`.augment` — jit-able SpecAugment
- :mod:`.checkpoint` — orbax train-state persistence
- ``python -m danspeech_tpu.train`` — the CLI (``__main__``)
"""

from .data import (  # noqa: F401
    Batch,
    SpeechDataset,
    batches,
    encode_transcript,
    load_manifest,
    shard_batch,
    steps_per_epoch,
)
from .loop import (  # noqa: F401
    GreedyEvaluator,
    continue_training,
    evaluate_greedy,
    export_model,
    finetune,
    train,
)
from .step import (  # noqa: F401
    TrainState,
    freeze_mask,
    init_train_state,
    make_optimizer,
    make_train_step,
    make_wave_train_step,
)
