"""Model package: DeepSpeech2 config, params, forward functions, checkpoints."""

from __future__ import annotations

from .. import errors
from .config import DeepSpeechConfig, default_labels  # noqa: F401
from . import deepspeech  # noqa: F401
from .deepspeech import forward, init_params, num_params  # noqa: F401


class DeepSpeechModel:
    """A loaded acoustic model: config + parameter pytree.

    Object-level API mirrors what the reference's ``DeepSpeech`` module
    exposes to the Recognizer (model_name/labels/audio_conf/context,
    model.py:329-338) while keeping compute purely functional.
    """

    def __init__(self, config: DeepSpeechConfig, params):
        self.config = config
        self.params = params

    # -- reference-compatible attribute surface --------------------------------
    @property
    def model_name(self):
        return self.config.model_name

    @property
    def labels(self):
        return self.config.labels

    @property
    def audio_conf(self):
        return self.config.audio_conf

    @property
    def context(self):
        return self.config.context

    @property
    def rnn_hidden_size(self):
        return self.config.rnn_hidden_size

    @property
    def streaming_model(self):
        return self.config.streaming_model

    def get_param_size(self) -> int:
        return num_params(self.params)

    # -- constructors ----------------------------------------------------------
    @classmethod
    def load_model(cls, path) -> "DeepSpeechModel":
        """Load either a reference .pth package or a native .dsz checkpoint
        (reference load_model, model.py:599-624)."""
        from .checkpoint import load_checkpoint, load_reference_checkpoint

        p = str(path)
        if p.endswith(".dsz"):
            config, params = load_checkpoint(p)
        else:
            config, params = load_reference_checkpoint(p)
        return cls(config, params)

    @classmethod
    def load_model_package(cls, package: dict) -> "DeepSpeechModel":
        from .checkpoint import config_from_package, params_from_state_dict

        config = config_from_package(package)
        params = params_from_state_dict(package["state_dict"], config)
        return cls(config, params)

    @classmethod
    def init_random(cls, config: DeepSpeechConfig, seed: int = 0) -> "DeepSpeechModel":
        return cls(config, init_params(config, seed=seed))

    def save(self, path: str) -> None:
        from .checkpoint import save_checkpoint

        save_checkpoint(path, self.config, self.params)


# Reference-compatible alias: the reference exposes the model class as
# ``DeepSpeech`` (danspeech/deepspeech/model.py:287).
DeepSpeech = DeepSpeechModel
