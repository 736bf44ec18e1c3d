from .beam import BeamCTCDecoder, prefix_beam_search  # noqa: F401
from .device_beam import DeviceBeamDecoder  # noqa: F401
from .greedy import Decoder, GreedyDecoder  # noqa: F401
from .kenlm_reader import KenLMProbingModel, load_kenlm_probing  # noqa: F401
from .lm import NgramLM, PackedNgramLM, load_arpa, load_lm  # noqa: F401
from .metrics import cer, levenshtein, wer  # noqa: F401
