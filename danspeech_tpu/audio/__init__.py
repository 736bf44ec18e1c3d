"""Host-side audio I/O: loaders, PCM containers, DSP, capture sources.

Mirrors the capability surface of ``danspeech.audio``
(/root/reference/danspeech/audio/__init__.py:1-2).
"""

from .io import (  # noqa: F401
    AudioData,
    SpeechFile,
    SpeechSource,
    load_audio,
    load_audio_pcm16,
    load_audio_wavPCM,
)
from .microphone import Microphone  # noqa: F401
