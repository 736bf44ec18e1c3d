"""danspeech_tpu — a TPU-native Danish speech-recognition framework.

Drop-in capability surface of the reference ``danspeech`` package
(/root/reference/danspeech/__init__.py:1-22) rebuilt TPU-first on
JAX/XLA/Pallas.
"""

from .engine import DanSpeechRecognizer  # noqa: F401
from .multistream import MultiStreamTranscriber  # noqa: F401
from .recognizer import Recognizer  # noqa: F401
from .utils.cache import clean_cache  # noqa: F401

__version__ = "0.1.0"
