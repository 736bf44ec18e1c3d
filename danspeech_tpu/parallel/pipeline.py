"""Pipeline-parallel inference: layer stages across devices, microbatched.

SURVEY §2.5 marks PP optional for this architecture (TP covers the
model-too-big case); this module completes it anyway as a first-class
strategy for the serving shape TP handles worst — deep stacks on hosts
with several small-HBM chips. The reference has no distributed layer at
all (danspeech runs single-device, DanSpeechRecognizer.py:19).

Design (TPU-idiomatic GPipe for inference):

- The network is split into ``n_stages`` contiguous stages — stage 0
  carries the conv stack plus its share of GRU layers, middle stages
  carry GRU layers, the last stage adds lookahead (uni models) + the
  BN/Linear head + softmax. Each stage's parameter slice is committed to
  its own device once at construction.
- A batch is cut into microbatches of ``micro_batch`` rows. The host
  enqueues microbatch k's stage-s program right after its stage-(s-1)
  program; JAX's async dispatch queues are per-device, so device s
  executes microbatch k while device s+1 executes microbatch k-1 — the
  classic pipeline wavefront emerges from dispatch order alone, with no
  host synchronization until the final fetch.
- Inter-stage activation handoff is `jax.device_put(x, next_device)` —
  a device-to-device copy enqueued asynchronously (ICI on a real
  multi-chip host).

Scope: one controller process (chips visible to this host). Cross-host
pipelines would hand off via collective_permute inside a shard_map —
out of scope while the time-sharded wavefront (parallel/time_shard.py)
covers the long-utterance case.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..features.spectrogram import SpectrogramAudioParser
from ..models import deepspeech as ds
from ..ops import conv as conv_ops
from ..ops import stft as stft_ops


def partition_layers(n_rnn: int, n_stages: int) -> list[range]:
    """Split rnn layer indices into n_stages contiguous, near-even groups.

    The conv stack rides with stage 0 and the head with the last stage,
    so when layers don't divide evenly the extra layers go to the MIDDLE
    stages first (stage 0 and the last stage are already the heaviest).
    """
    if not 1 <= n_stages <= n_rnn:
        raise ValueError(f"n_stages={n_stages} must be in [1, {n_rnn}]")
    base, extra = divmod(n_rnn, n_stages)
    sizes = [base] * n_stages
    order = sorted(range(n_stages), key=lambda s: (s in (0, n_stages - 1), s))
    for i in range(extra):
        sizes[order[i]] += 1
    bounds = np.cumsum([0] + sizes)
    return [range(int(bounds[s]), int(bounds[s + 1])) for s in range(n_stages)]


class PipelinedTranscriber:
    """GPipe-style microbatched inference over per-device layer stages."""

    SAMPLE_BUCKET = 16000

    def __init__(self, model, devices=None, n_stages: int | None = None,
                 micro_batch: int = 8):
        self.model = model
        self.config = config = model.config
        devices = list(devices if devices is not None else jax.devices())
        n_rnn = config.rnn_layers
        if n_stages is None:
            n_stages = min(len(devices), n_rnn)
        if n_stages > len(devices):
            raise ValueError(
                f"n_stages={n_stages} exceeds {len(devices)} devices"
            )
        self.devices = devices[:n_stages]
        self.n_stages = n_stages
        self.micro_batch = int(micro_batch)
        self.stage_layers = partition_layers(n_rnn, n_stages)

        parser = SpectrogramAudioParser(model.audio_conf)
        self._parser = parser

        # commit each stage's parameter slice to its device
        params = model.params
        self._stage_params = []
        for s, layers in enumerate(self.stage_layers):
            piece = {"rnns": [params["rnns"][i] for i in layers]}
            if s == 0:
                piece["conv"] = params["conv"]
            if s == n_stages - 1:
                piece["fc_bn"] = params["fc_bn"]
                piece["fc"] = params["fc"]
                if not config.bidirectional:
                    piece["lookahead"] = params["lookahead"]
            self._stage_params.append(
                jax.device_put(piece, self.devices[s])
            )

        self._stage_fns = [self._build_stage(s) for s in range(n_stages)]

    def _build_stage(self, s: int):
        config = self.config
        parser = self._parser
        first = s == 0
        last = s == self.n_stages - 1

        def run(piece, x, lengths):
            if first:
                # waveforms -> spectrogram -> conv -> (T, B, H)
                spect, frame_lens = stft_ops.batched_log_spectrogram(
                    x if x.dtype == jnp.float32 else x.astype(jnp.float32),
                    lengths,
                    parser.n_fft,
                    parser.hop_length,
                    parser.window,
                    normalize=parser.normalize,
                )
                out_lengths = ds.get_seq_lens(config, frame_lens)
                h = ds.conv_stack(
                    piece, config, spect[:, None, :, :], out_lengths
                )
                n, c, f, t = h.shape
                h = jnp.transpose(h.reshape(n, c * f, t), (2, 0, 1))
            else:
                h, out_lengths = x, lengths
            for entry in piece["rnns"]:
                h = ds._apply_rnn_layer(config, entry, h, out_lengths)
            if last:
                if not config.bidirectional:
                    h = conv_ops.hardtanh(
                        conv_ops.lookahead(h, piece["lookahead"])
                    )
                h = ds.head(piece, h)
                h = jax.nn.softmax(jnp.transpose(h, (1, 0, 2)), axis=-1)
            return h, out_lengths

        return jax.jit(run)

    # ------------------------------------------------------------------

    def acoustic_probs(self, recordings: list[np.ndarray]):
        """Waveforms -> (probs (B, T, C), out_lengths), microbatch-pipelined.

        Enqueue order puts microbatch k's stage-s program immediately
        after its stage-(s-1) handoff, so all stages run concurrently on
        different microbatches; nothing blocks until the final fetch.
        """
        from .batch import bucket_maxlen

        b = len(recordings)
        if b == 0:
            return (
                np.zeros((0, 0, len(self.model.labels)), np.float32),
                np.zeros((0,), np.int32),
            )
        lengths = np.array([len(r) for r in recordings], dtype=np.int32)
        maxlen = bucket_maxlen(lengths, self.SAMPLE_BUCKET)
        mb = self.micro_batch
        outs = []
        for k in range(0, b, mb):
            rows = recordings[k : k + mb]
            # pad the final microbatch to mb rows (pad lengths pinned to a
            # real row) so every stage compiles exactly one program per
            # shape — a varying remainder would recompile all stages
            batch = np.zeros((mb, maxlen), dtype=np.float32)
            ln_np = np.empty((mb,), np.int32)
            for j, r in enumerate(rows):
                batch[j, : len(r)] = r
                ln_np[j] = len(r)
            ln_np[len(rows):] = ln_np[0]
            # straight to the stage-0 device (jnp.asarray would stage the
            # batch through the default device first)
            x = jax.device_put(batch, self.devices[0])
            ln = jax.device_put(ln_np, self.devices[0])
            for s in range(self.n_stages):
                if s > 0:
                    x = jax.device_put(x, self.devices[s])
                    ln = jax.device_put(ln, self.devices[s])
                x, ln = self._stage_fns[s](self._stage_params[s], x, ln)
            outs.append((x, ln, len(rows)))
        probs = np.concatenate(
            [np.asarray(p)[:n] for p, _, n in outs], axis=0
        )
        out_lens = np.concatenate(
            [np.asarray(l)[:n] for _, l, n in outs], axis=0
        )
        return probs, out_lens

    def transcribe(self, recordings: list[np.ndarray], decoder) -> list[str]:
        probs, out_lens = self.acoustic_probs(recordings)
        decoded, _ = decoder.decode(probs, out_lens)
        return [d[0] for d in decoded]
