"""Batch-aware automatic beam-backend selection.

The engine's ``backend="auto"`` used to pin the device beam whenever the
LM packed into HBM tables — but the device beam's fixed-shape scan only
pays off once enough batch rows amortize it; at B=4 the threaded host C++
beam is ~1.6x faster (round-4 rtf_results: config 3 host 60.5 vs config
3.5 device 38.4 audio-s/s). This wrapper owns BOTH backends lazily and
picks per decode call by batch size against a measured crossover
(benchmarks/beam_crossover.json), so "auto" beats either pinned backend
at its own operating point — the batch-aware default the reference can't
express (its ctcdecode backend is fixed at construction,
/root/reference/danspeech/DanSpeechRecognizer.py:88-92).
"""

from __future__ import annotations

import numpy as np

from .greedy import Decoder

# Batch size at and above which the device beam wins. Measured on the TPU
# v5e chip via benchmarks/beam_crossover.py (committed artifact
# beam_crossover.json: B=1 host 126.7 vs device 73.1 audio-s/s; B=4
# device 250.2 vs host 117.5, widening to 1,114 vs 125 at B=128);
# override per instance or with DANSPEECH_TPU_BEAM_CROSSOVER.
DEFAULT_CROSSOVER = 4


def _crossover_default() -> int:
    import os

    v = os.environ.get("DANSPEECH_TPU_BEAM_CROSSOVER")
    return int(v) if v else DEFAULT_CROSSOVER


class AutoBeamDecoder(Decoder):
    """Dispatch each decode to the host C++ beam (small batches) or the
    on-device fused beam (large batches).

    Both backends produce identical transcripts (test_api_backends,
    test_device_beam); only throughput differs, so switching per call is
    free of accuracy consequences. Backends construct lazily — a server
    that only ever sees one regime never builds (or packs) the other.
    """

    supports_n_best = True  # decode() accepts n_best; host path ignores it

    def __init__(
        self,
        labels: str,
        lm,
        device_lm,
        alpha: float,
        beta: float,
        beam_width: int,
        blank_index: int = 0,
        crossover: int | None = None,
        num_processes: int = 6,
        cutoff_top_n: int = 40,
        cutoff_prob: float = 1.0,
    ):
        super().__init__(labels, blank_index)
        self.lm = lm
        self.device_lm = device_lm
        self.alpha = alpha
        self.beta = beta
        self.beam_width = beam_width
        self.crossover = (
            crossover if crossover is not None else _crossover_default()
        )
        self.num_processes = num_processes
        self.cutoff_top_n = cutoff_top_n
        self.cutoff_prob = cutoff_prob
        self._host = None
        self._device = None

    # -- lazy backends --------------------------------------------------
    def _host_decoder(self):
        if self._host is None:
            from .beam import BeamCTCDecoder

            self._host = BeamCTCDecoder(
                labels=self.labels,
                lm_path=self.lm,
                alpha=self.alpha,
                beta=self.beta,
                beam_width=self.beam_width,
                num_processes=self.num_processes,
                cutoff_prob=self.cutoff_prob,
                cutoff_top_n=self.cutoff_top_n,
                blank_index=self.blank_index,
            )
        return self._host

    def _device_decoder(self):
        if self._device is None:
            from .device_beam import DeviceBeamDecoder

            self._device = DeviceBeamDecoder(
                labels=self.labels,
                beam_width=self.beam_width,
                blank_index=self.blank_index,
                lm=self.device_lm,
                alpha=self.alpha,
                beta=self.beta,
            )
        return self._device

    def for_batch(self, batch_size: int):
        """The concrete decoder for a ``batch_size``-row dispatch group —
        the engine resolves per group so a mixed workload rides each
        backend where it wins."""
        if batch_size >= self.crossover:
            return self._device_decoder()
        return self._host_decoder()

    def decode(self, probs, sizes=None, n_best: int | None = None):
        """Standalone decode: resolve by the probs batch dimension.

        The engine path resolves earlier (``for_batch``) to keep device
        probs in HBM for the device backend and slice padding rows before
        the host backend; callers coming through here get the same
        routing with a host fetch when the host backend wins.
        """
        batch = int(np.asarray(probs.shape[0]))
        decoder = self.for_batch(batch)
        if getattr(decoder, "supports_n_best", False):
            return decoder.decode(probs, sizes, n_best=n_best)
        return decoder.decode(np.asarray(probs), sizes)
