"""Training-step throughput on the real chip -> train_throughput.json.

Measures the full jitted wave->STFT->forward->CTC->backward->update
program (make_wave_train_step) at a training-realistic shape and reports
audio-seconds of speech trained per wall-second per chip, plus the
model-FLOP utilization of the train step (fwd+bwd ~= 3x forward FLOPs).
GRU training runs the Mosaic recurrence in BOTH directions of autodiff:
the forward kernels plus the custom-VJP backward walk
(ops/pallas_gru.py:gru_bwd_scan) — measured 585 -> 1,210 audio-s/s on
the flagship shape when it replaced the lax.scan recurrence (r5).

Usage: python benchmarks/train_throughput.py [--batch 32] [--seconds 8]
       [--hidden 1200] [--layers 9] [--iters 5]
"""

from __future__ import annotations

import argparse
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


def measure(config, b, seconds, iters, mixed_precision, remat, augment=False):
    from danspeech_tpu.train import (
        init_train_state,
        make_optimizer,
        make_wave_train_step,
    )

    opt = make_optimizer(3e-4)
    state = init_train_state(config, opt, seed=0)
    step = jax.jit(
        make_wave_train_step(
            config, opt, augment=augment,
            mixed_precision=mixed_precision, remat=remat,
        ),
        donate_argnums=(0,),
    )

    n = int(seconds * 16000)
    rng = np.random.default_rng(0)
    waves = jnp.asarray(rng.normal(size=(b, n)).astype(np.float32) * 3000)
    wave_lens = jnp.full((b,), n, jnp.int32)
    labels = jnp.asarray(
        rng.integers(1, config.num_classes, (b, 48)).astype(np.int32)
    )
    label_lens = jnp.full((b,), 48, jnp.int32)
    weights = jnp.ones((b,), jnp.float32)
    key = jax.random.PRNGKey(0)

    state, loss = step(state, waves, wave_lens, labels, label_lens, weights, key)
    _ = float(loss)  # force compile + first run
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step(state, waves, wave_lens, labels, label_lens, weights, key)
    _ = float(loss)
    return (time.perf_counter() - t0) / iters, float(loss)


def gru_step_flops(config, b, seconds):
    """fwd+bwd GRU FLOPs (bwd ~= 2x fwd); conv/stft/ctc excluded."""
    t_stft = 1 + int(seconds * 16000) // 160
    # conv time-stride 2 happens once (conv1); freq strides don't touch T
    t_rnn = (t_stft + 2 * 5 - 11) // 2 + 1
    h = config.rnn_hidden_size
    fwd = 0.0
    in_dim = config.rnn_input_size
    for _ in range(config.rnn_layers):
        fwd += 2 * 2 * t_rnn * b * (in_dim + h) * 3 * h
        in_dim = h
    return 3.0 * fwd, t_rnn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=8.0)
    ap.add_argument("--hidden", type=int, default=1200)
    ap.add_argument("--layers", type=int, default=9)
    ap.add_argument("--conv-layers", type=int, default=3)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument(
        "--points", nargs="*",
        default=["32:off:off", "32:on:on", "64:on:on", "128:on:on"],
        help="batch:mixed_precision(on/off):remat(on/off) per point",
    )
    args = ap.parse_args()

    from danspeech_tpu.models.config import DeepSpeechConfig

    config = DeepSpeechConfig(
        model_name="train-bench",
        rnn_hidden_size=args.hidden,
        rnn_layers=args.layers,
        conv_layers=args.conv_layers,
        bidirectional=True,
    )

    rows = []
    for point in args.points:
        b_s, mp_s, rm_s = point.split(":")
        b = int(b_s)
        mp, rm = mp_s == "on", rm_s == "on"
        try:
            dt, loss = measure(
                config, b, args.seconds, args.iters, mp, rm
            )
        except Exception as e:  # e.g. OOM at a large batch without remat
            rows.append({"batch": b, "mixed_precision": mp, "remat": rm,
                         "error": f"{type(e).__name__}"})
            print(json.dumps(rows[-1]), flush=True)
            continue
        flops, t_rnn = gru_step_flops(config, b, args.seconds)
        tflops = flops / dt / 1e12
        rows.append({
            "batch": b,
            "mixed_precision": mp,
            "remat": rm,
            "audio_s_per_s_chip": round(b * args.seconds / dt, 1),
            "step_ms": round(dt * 1e3, 1),
            "approx_gru_tflops": round(tflops, 1),
            "approx_pct_of_197tflops_roofline": round(tflops / 197 * 100, 1),
        })
        print(json.dumps(rows[-1]), flush=True)

    best = max(
        (r for r in rows if "error" not in r),
        key=lambda r: r["audio_s_per_s_chip"],
    )
    out = {
        "metric": "train_step_throughput",
        "value": best["audio_s_per_s_chip"],
        "unit": "audio-s/s/chip",
        "setup": (
            f"{args.layers}x{args.hidden} bidi GRU, {args.conv_layers} conv, "
            f"{args.seconds:.0f}s rows, 48-label targets, Mosaic fwd+bwd "
            f"recurrence kernels (custom VJP), f32 master params, "
            f"iters={args.iters}, TPU v5e 1 chip (r5); best point "
            f"B={best['batch']} mixed_precision={best['mixed_precision']} "
            f"remat={best['remat']}"
        ),
        "points": rows,
        "note": (
            "One jitted wave->STFT->forward->CTC->backward->update program "
            "(train/step.py:make_wave_train_step). FLOP estimate is "
            "GRU-only with bwd counted as 2x fwd; conv/stft/ctc excluded, "
            "so true utilization is slightly higher. mixed_precision casts "
            "matmul weights to bf16 inside autodiff (f32 masters); remat "
            "checkpoints each RNN layer so big batches fit HBM. The GRU "
            "backward is the Mosaic walk in pallas_gru.gru_bwd_scan "
            "(gradient parity vs lax.scan pinned in "
            "tests/test_pallas_grad.py); replacing the scan lifted the "
            "best point from 817 to this figure."
        ),
        "measured": time.strftime("%Y-%m-%d"),
    }
    print(json.dumps(out, indent=2))
    with open(os.path.join(REPO, "benchmarks", "train_throughput.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
