"""Stage attribution of the flagship pipeline on the real TPU chip.

Round-4's version timed each stage as its OWN dispatched program; every
isolated measurement paid per-dispatch relay overhead the one-program
pipeline doesn't, so the parts summed to ~46 % more than the whole and
the derived GRU MFU was unreliable (round-4 verdict weak #1).

This version times PREFIX PROGRAMS of the one jitted pipeline —
  P0 = stft
  P1 = stft + conv
  Pk = stft + conv + first k GRU layers   (k = 1, 9)
  Pf = full pipeline (P9 + head + argmax)
— each enqueued ITERS times and forced once with a tiny fixed-size fetch,
and attributes by DIFFERENCE: conv = P1 - P0, rnn = P9 - P1, head =
Pf - P9. The per-program dispatch/fetch overhead is constant, so it
cancels in every difference, and the attributed stages telescope to the
full-pipeline time BY CONSTRUCTION (stft keeps the one residual overhead
term). Per-layer time = (P9 - P1_layer) / 8 on the in=1200 layers.

Writes benchmarks/profile_breakdown.json (consumed by render_perf.py for
the README MFU row). Not part of bench.py — a measurement tool.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from danspeech_tpu.features.spectrogram import SpectrogramAudioParser
from danspeech_tpu.models import deepspeech as ds
from danspeech_tpu.models.config import DeepSpeechConfig
from danspeech_tpu.ops import stft as stft_ops

# 128 = the serving batch (one full MXU row tile, what bench.py's dispatch
# groups use)
B = int(os.environ.get("B", "128"))
ITERS = int(os.environ.get("ITERS", "10"))

config = DeepSpeechConfig(
    model_name="DanSpeechPrimary", rnn_hidden_size=1200, rnn_layers=9,
    conv_layers=3, bidirectional=True,
)
params = ds.cast_matmul_weights(ds.init_params(config, seed=0))
parser = SpectrogramAudioParser(config.audio_conf)

rng = np.random.default_rng(0)
maxlen = 128000  # 8 s
waves = jnp.asarray(rng.normal(size=(B, maxlen)).astype(np.float32) * 3000)
lens = jnp.full((B,), maxlen, jnp.int32)


def prefix_program(n_rnn_layers: int, with_head: bool):
    """One jitted program running the pipeline up to a cut point; returns
    a tiny (1,) slice so every measurement fetches the same 4 bytes."""

    @jax.jit
    def run(p, w, l):
        spect, frame_lens = stft_ops.batched_log_spectrogram(
            w, l, parser.n_fft, parser.hop_length, parser.window
        )
        if n_rnn_layers < 0:  # stft only
            return spect.ravel()[:1]
        out_lengths = ds.get_seq_lens(config, frame_lens)
        x = ds.conv_stack(p, config, spect[:, None, :, :], out_lengths)
        n, c, f, t = x.shape
        x = jnp.transpose(x.reshape(n, c * f, t), (2, 0, 1))
        for entry in p["rnns"][:n_rnn_layers]:
            x = ds._apply_rnn_layer(config, entry, x, out_lengths)
        if with_head:
            x = ds.head(p, x)
            x = jnp.argmax(jnp.transpose(x, (1, 0, 2)), axis=-1)
            return x.ravel()[:1]
        return x.ravel()[:1]

    return run


def timeit(name, fn):
    out = fn(params, waves, lens)
    _ = float(np.asarray(out)[0])  # force (compile + first run)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(params, waves, lens)
    _ = float(np.asarray(out)[0])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:22s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


t_p0 = timeit("P0 stft", prefix_program(-1, False))
t_p1 = timeit("P1 +conv", prefix_program(0, False))
t_l1 = timeit("P2 +gru layer0", prefix_program(1, False))
t_l9 = timeit("P9 +gru layers0-8", prefix_program(9, False))
t_full = timeit("Pf full pipeline", prefix_program(9, True))

# frame counts (static facts of the shapes)
t_frames = stft_ops.num_frames(maxlen, parser.n_fft, parser.hop_length, True)
t_rnn = int(
    np.asarray(ds.get_seq_lens(config, jnp.asarray([t_frames], jnp.int32)))[0]
)

audio_s = B * maxlen / 16000.0
stage_stft = t_p0
stage_conv = t_p1 - t_p0
stage_layer0 = t_l1 - t_p1  # in=2016 layer
stage_rnn = t_l9 - t_p1  # all 9 layers
per_layer = (t_l9 - t_l1) / 8.0  # in=1200 layers
stage_head = t_full - t_l9

# in-pipeline MFU of one in=1200 bidirectional GRU layer
layer_flops = 2 * 2 * t_rnn * B * (1200 + 1200) * 3600  # proj+recur, 2 dirs
layer_tflops = layer_flops / per_layer / 1e12
artifact = {
    "setup": (
        f"DanSpeechPrimary 9x1200 bidi, B={B}, {maxlen / 16000:.0f} s rows, "
        f"T={t_frames} stft frames / {t_rnn} rnn steps, TPU v5e 1 chip, "
        f"ITERS={ITERS}, prefix-program difference attribution (r5)"
    ),
    "prefix_programs_ms": {
        "P0_stft": round(t_p0 * 1e3, 2),
        "P1_conv": round(t_p1 * 1e3, 2),
        "P2_gru_layer0": round(t_l1 * 1e3, 2),
        "P9_gru_all": round(t_l9 * 1e3, 2),
        "Pf_full": round(t_full * 1e3, 2),
    },
    "stages_ms": {
        "stft": round(stage_stft * 1e3, 2),
        "conv_stack": round(stage_conv * 1e3, 2),
        "gru_layer0_in2016": round(stage_layer0 * 1e3, 2),
        "gru_stack_9layers": round(stage_rnn * 1e3, 2),
        "gru_per_layer_in1200": round(per_layer * 1e3, 2),
        "head_argmax": round(stage_head * 1e3, 2),
        "full_pipeline": round(t_full * 1e3, 2),
    },
    "stages_sum_check_ms": round(
        (stage_stft + stage_conv + stage_rnn + stage_head) * 1e3, 2
    ),
    "audio_s_per_s_chip": round(audio_s / t_full, 1),
    "gru_layer_tflops": round(layer_tflops, 1),
    "gru_layer_pct_of_197tflops_roofline": round(
        layer_tflops / 197.0 * 100, 1
    ),
}
print(json.dumps(artifact, indent=2))
with open(os.path.join(REPO, "benchmarks", "profile_breakdown.json"), "w") as f:
    json.dump(artifact, f, indent=2)
