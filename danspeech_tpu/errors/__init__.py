"""Typed exceptions for danspeech_tpu.

Mirrors the reference error surface (/root/reference/danspeech/errors/
{recognizer_errors.py:1-21, model_errors.py:1-10, training_errors.py:1-4})
so downstream code catching these by name keeps working.
"""


class WaitTimeoutError(Exception):
    """Listening timed out while waiting for a phrase to start."""


class RequestError(Exception):
    pass


class UnknownValueError(Exception):
    pass


class ModelNotInitialized(Exception):
    """An LM/decoder was requested before an acoustic model was set."""


class WrongUsageOfListen(Exception):
    """A completed listen generator was advanced again."""


class NoDataInBuffer(Exception):
    """The background listener thread has produced no new audio yet."""


class ArgumentMissingForOption(Exception):
    pass


class ConvError(Exception):
    """Unsupported convolutional stack configuration (must be 1..3 layers)."""


class ModelDoesNotExistError(Exception):
    pass


class FreezingMoreLayersThanExist(Exception):
    """Tried to freeze more layers than the model has."""


class InvalidDataError(Exception):
    pass
