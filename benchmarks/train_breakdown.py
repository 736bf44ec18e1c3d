"""Where the training step's time goes -> train_breakdown.json.

Prefix-program difference attribution (the profile_breakdown.py method)
applied to the TRAIN step at its best operating point (B=128, remat,
bf16 matmul weights): times value_and_grad over pipeline prefixes so the
stage costs telescope, then isolates the two Mosaic recurrence kernels
(fwd walk, bwd walk) and the weight-gradient einsums of one layer.

Usage: python benchmarks/train_breakdown.py [--batch 128] [--iters 5]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seconds", type=float, default=8.0)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from danspeech_tpu.models import deepspeech as ds
    from danspeech_tpu.models.config import DeepSpeechConfig
    from danspeech_tpu.ops import rnn as rnn_ops
    from danspeech_tpu.ops.pallas_gru import gru_bwd_scan, gru_scan_bidi_fused

    config = DeepSpeechConfig(
        model_name="train-bd", rnn_hidden_size=1200, rnn_layers=9,
        conv_layers=3, bidirectional=True,
    )
    params = ds.cast_matmul_weights(ds.init_params(config, seed=0))
    b, h = args.batch, 1200
    n = int(args.seconds * 16000)
    t_rnn = ((1 + n // 160) + 2 * 5 - 11) // 2 + 1
    rng = np.random.default_rng(0)

    def timeit(name, fn, *xs):
        out = fn(*xs)
        _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*xs)
        _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:34s} {dt * 1e3:9.1f} ms", flush=True)
        return dt

    # --- isolated per-layer components at the recurrence shape -----------
    x_layer = jnp.asarray(
        rng.normal(size=(t_rnn, b, h)).astype(np.float32) * 0.1
    )
    lengths = jnp.full((b,), t_rnn, jnp.int32)
    entry = params["rnns"][1]
    fwdw, bwdw = entry["fwd"], entry["bwd"]

    t_fwd_kernel = timeit(
        "layer fwd (fused bidi kernel)",
        # fetch ONE element — fetching a (T, B, H) output through the
        # relay would bill ~1 s of transfer to the kernel (the round-4
        # lesson behind profile_breakdown's prefix method)
        jax.jit(lambda x: gru_scan_bidi_fused(
            x.astype(fwdw.w_ih.dtype), lengths,
            fwdw.w_ih, bwdw.w_ih, fwdw.w_hh, bwdw.w_hh,
            fwdw.b_ih, bwdw.b_ih, fwdw.b_hh, bwdw.b_hh,
            jnp.zeros((b, h), jnp.float32), jnp.zeros((b, h), jnp.float32),
        )[0].ravel()[:1]),
        x_layer,
    )

    mm = fwdw.w_ih.dtype
    gx = jnp.asarray(rng.normal(size=(t_rnn, b, 3 * h)).astype(np.float32)).astype(mm)
    hprev = jnp.asarray(rng.normal(size=(t_rnn, b, h)).astype(np.float32)).astype(mm)
    dout = jnp.asarray(rng.normal(size=(t_rnn, b, h)).astype(np.float32))
    dhl = jnp.zeros((b, h), jnp.float32)

    t_bwd_kernel = timeit(
        "layer bwd walk (one direction)",
        jax.jit(lambda g, hp, do: gru_bwd_scan(
            g, hp, do, lengths, fwdw.w_hh, fwdw.b_hh, fwdw.b_ih, dhl,
            reverse=True,
        )[0].ravel()[:1]),
        gx, hprev, dout,
    )

    dgx = jnp.asarray(rng.normal(size=(t_rnn, b, 3 * h)).astype(np.float32))

    t_einsums = timeit(
        "layer grad einsums (one dir)",
        jax.jit(lambda xx, dg, hp: (
            jnp.einsum("tbh,tbg->hg", hp.astype(mm), dg.astype(mm),
                       preferred_element_type=jnp.float32).ravel()[:1],
            jnp.einsum("tbi,tbg->ig", xx.astype(mm), dg.astype(mm),
                       preferred_element_type=jnp.float32).ravel()[:1],
            jnp.einsum("tbg,ig->tbi", dg.astype(mm), fwdw.w_ih,
                       preferred_element_type=jnp.float32).ravel()[:1],
        )),
        x_layer, dgx, hprev,
    )

    # --- the full train-step value_and_grad over one layer (remat) -------
    def layer_loss(w_pair, x):
        out, _ = rnn_ops.gru_layer(x, lengths, w_pair[0], w_pair[1])
        return jnp.sum(out * 1e-3)

    t_layer_vjp = timeit(
        "layer value_and_grad (pallas vjp)",
        jax.jit(lambda wp, x: jax.value_and_grad(layer_loss)(wp, x)),
        (fwdw, bwdw), x_layer,
    )

    out = {
        "setup": (
            f"B={b}, T={t_rnn} rnn steps, H=1200 bidi, bf16 weights, "
            f"iters={args.iters}, TPU v5e 1 chip (r5)"
        ),
        "ms": {
            "layer_fwd_fused_kernel": round(t_fwd_kernel * 1e3, 1),
            "layer_bwd_walk_one_dir": round(t_bwd_kernel * 1e3, 1),
            "layer_grad_einsums_one_dir": round(t_einsums * 1e3, 1),
            "layer_value_and_grad_total": round(t_layer_vjp * 1e3, 1),
        },
        "note": (
            "value_and_grad total per layer ~= fwd kernel (cotangent path "
            "re-runs it under remat at the step level) + 2x bwd walk + 2x "
            "grad einsums + projection recompute. Compare against "
            "train_throughput.json's step_ms / 9 layers."
        ),
        "measured": time.strftime("%Y-%m-%d"),
    }
    print(json.dumps(out, indent=2))
    with open(os.path.join(REPO, "benchmarks", "train_breakdown.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
