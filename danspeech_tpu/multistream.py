"""Cohort-batched streaming: S concurrent real-time sessions, one chunk step.

The reference's streaming path is strictly single-stream — batch is
hard-coded to 1 in its chunk state machine
(/root/reference/danspeech/DanSpeechRecognizer.py:154) and each chunk pays a
full host->device->host round trip. On TPU a (1, H) chunk step is the worst
possible shape: every GRU step is a (1, H) x (H, 3H) matvec that occupies one
MXU row, and the dispatch+fetch round trip over the host link dwarfs device
time.

``MultiStreamTranscriber`` steps S streams in lockstep through ONE jitted
chunk step whose batch dimension is the stream index. Every per-frame matvec
becomes an (S, H) x (H, 3H) matmul and the round trip is paid once per
cohort, so the chip serves S real-time sessions for roughly the cost of one
(measured as rtf harness config 4.5, ``streaming_chunked_32streams`` in
benchmarks/rtf_results.json, vs the single-stream config 4).

Cohort semantics: all streams advance together with the same chunk sample
count per step and shared is_first/is_last flags — the natural shape for a
serving frontend that groups fixed-cadence sessions (e.g. 1 s chunks) into
cohorts and refills a closing session's slot at the next epoch. Per-stream
behavior (adaptive feature normalization, greedy partials, the
chunk-boundary repeated-char join hack, the optional LM final re-decode) is
exactly S independent ``DanSpeechRecognizer`` streams — pinned in
tests/test_multistream.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .decode.greedy import GreedyDecoder
from .features.spectrogram import InferenceSpectrogramAudioParser
from .models import deepspeech as ds
from .models import streaming
from .models.streaming import streaming_step_masked


def _bucket(n: int, quantum: int) -> int:
    return max(quantum, ((n + quantum - 1) // quantum) * quantum)


class MultiStreamTranscriber:
    """Serve ``n_streams`` concurrent chunked-audio sessions in lockstep.

    Parameters
    ----------
    model:
        A streaming (unidirectional + lookahead, 2-conv) ``DeepSpeechModel``.
    n_streams:
        Cohort size S. Each :meth:`step` call takes exactly S chunks.
    final_decoder:
        Optional decoder (e.g. ``BeamCTCDecoder``) applied per stream to the
        concatenated probability stream on the final chunk (the reference's
        LM final re-decode, DanSpeechRecognizer.py:203-208). ``None`` keeps
        the accumulated greedy transcript.
    """

    CHUNK_BUCKET = 16

    def __init__(self, model, n_streams: int, final_decoder=None,
                 compute_dtype: str = "auto"):
        if n_streams < 1:
            raise ValueError("n_streams must be >= 1")
        devices = jax.devices()
        if compute_dtype == "auto":
            compute_dtype = (
                "bfloat16" if devices[0].platform in ("tpu", "axon")
                else "float32"
            )
        self.model = model
        self.n_streams = n_streams
        self.labels = model.labels
        if compute_dtype == "bfloat16":
            self._compute_params = ds.cast_matmul_weights(model.params)
        else:
            self._compute_params = model.params
        self.greedy_decoder = GreedyDecoder(
            labels=self.labels, blank_index=self.labels.index("_")
        )
        self.final_decoder = final_decoder
        self._stream_fns: dict = {}
        self.reset()

    # ------------------------------------------------------------------

    def reset(self) -> None:
        """Start a new stream epoch for every slot in the cohort."""
        self.parsers = [
            InferenceSpectrogramAudioParser(audio_config=self.model.audio_conf)
            for _ in range(self.n_streams)
        ]
        self.transcripts = [""] * self.n_streams
        self.full_output: list[np.ndarray] = []
        self._state = None

    def _step_jit(self, is_first: bool, is_last: bool):
        key = (is_first, is_last)
        if key not in self._stream_fns:
            config = self.model.config

            @jax.jit
            def run(params, spect_chunk, t_valid, state):
                return streaming_step_masked(
                    params, config, spect_chunk, t_valid, state,
                    is_first, is_last,
                )

            self._stream_fns[key] = run
        return self._stream_fns[key]

    # ------------------------------------------------------------------

    def step(self, chunks, is_last: bool, is_first: bool) -> list[str]:
        """Advance every stream by one chunk.

        ``chunks`` is a sequence of ``n_streams`` waveform chunks with the
        SAME sample count (lockstep cohort). Returns the per-stream partial
        transcripts (the new text this chunk contributed), or — when
        ``is_last`` — the per-stream final transcripts.
        """
        if len(chunks) != self.n_streams:
            raise ValueError(
                f"expected {self.n_streams} chunks, got {len(chunks)}"
            )
        lens = {len(c) for c in chunks}
        if len(lens) != 1:
            raise ValueError(
                "cohort chunks must share one sample count per step "
                f"(got lengths {sorted(lens)})"
            )

        spects = [
            p.parse_audio(np.asarray(c, dtype=np.float32), is_last)
            for p, c in zip(self.parsers, chunks)
        ]
        partials = [""] * self.n_streams

        if len(spects[0]) != 0:
            spect = np.stack(
                [np.asarray(s, dtype=np.float32) for s in spects]
            )  # (S, F, T) — identical T per stream by lockstep
            t_chunk = spect.shape[2]
            t_padded = _bucket(
                t_chunk + streaming.CHUNK_HEADROOM, self.CHUNK_BUCKET
            )
            batch = np.zeros(
                (self.n_streams, 1, spect.shape[1], t_padded), np.float32
            )
            batch[:, 0, :, :t_chunk] = spect

            if self._state is None:
                buf_cap = _bucket(
                    streaming.phys_rnn_frames(t_padded, is_first=True), 16
                )
                self._state = streaming.init_stream_state_masked(
                    self.model.config, buf_cap=buf_cap, batch=self.n_streams
                )

            probs, out_len, self._state = self._step_jit(is_first, is_last)(
                self._compute_params, jnp.asarray(batch), t_chunk, self._state
            )

            if not is_first:
                # single fetch for both results (one tunnel round trip)
                probs, out_len = jax.device_get((probs, out_len))
                probs = probs[:, : int(out_len)]
                if self.final_decoder is not None:
                    self.full_output.append(probs)
                decoded, _ = self.greedy_decoder.decode(probs)
                for s in range(self.n_streams):
                    text = decoded[s][0]
                    # chunk-boundary repeated-char join hack (reference
                    # DanSpeechRecognizer.py:170-174), per stream
                    if (
                        self.transcripts[s]
                        and text
                        and self.transcripts[s][-1] == text[0]
                    ):
                        text = text[1:]
                    self.transcripts[s] += text
                    partials[s] = text

        if is_last:
            finals = self._finalize()
            self.reset()
            return finals
        return partials

    # ------------------------------------------------------------------

    def _finalize(self) -> list[str]:
        # reference final-chunk gate (DanSpeechRecognizer.py:185): a stream
        # whose accumulated transcript has <= 1 char yields "" — and only
        # streams past the gate get the LM re-decode
        finals = [t if len(t) > 1 else "" for t in self.transcripts]
        if self.final_decoder is not None and self.full_output:
            cat = np.concatenate(self.full_output, axis=1)  # (S, T_tot, C)
            sizes = np.full((self.n_streams,), cat.shape[1], dtype=np.int32)
            decoded, _ = self.final_decoder.decode(cat, sizes)
            for s in range(self.n_streams):
                if len(self.transcripts[s]) > 1:
                    finals[s] = decoded[s][0]
        return finals
