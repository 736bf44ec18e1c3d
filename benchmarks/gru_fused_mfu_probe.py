"""MFU sweep of the fused bidi GRU layer kernel (B x unroll grid).

Round-3 verdict item 3: after correcting the FLOP arithmetic the fused
kernel measures ~56 % of the v5e bf16 roofline at B=104, unroll=1. This
probe sweeps the serving-relevant batch sizes and the kernel's unroll
factor to find the best operating point; profile_breakdown.py and the
engine default should match its winner. Dev tool; prints one line per
point and writes benchmarks/gru_fused_mfu.json.
"""

import itertools
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

from danspeech_tpu.ops.pallas_gru import gru_scan_bidi_fused

T = int(os.environ.get("T", "401"))
H = int(os.environ.get("H", "1200"))
D = int(os.environ.get("D", "1200"))
ITERS = int(os.environ.get("ITERS", "10"))
ROOFLINE_TFLOPS = 197.0  # v5e bf16

rng = np.random.default_rng(0)
w_if = jnp.asarray(rng.normal(size=(D, 3 * H)) * 0.02, jnp.bfloat16)
w_ib = jnp.asarray(rng.normal(size=(D, 3 * H)) * 0.02, jnp.bfloat16)
w_hf = jnp.asarray(rng.normal(size=(H, 3 * H)) * 0.02, jnp.bfloat16)
w_hb = jnp.asarray(rng.normal(size=(H, 3 * H)) * 0.02, jnp.bfloat16)
zeros3 = jnp.zeros((3 * H,), jnp.float32)

results = []
BS = tuple(int(v) for v in os.environ.get("BS", "104,128").split(","))
UNROLLS = tuple(int(v) for v in os.environ.get("UNROLLS", "1,2,4,8").split(","))
for B, unroll in itertools.product(BS, UNROLLS):
    x = jnp.asarray(rng.normal(size=(T, B, D)), jnp.bfloat16)
    h0 = jnp.zeros((B, H), jnp.float32)
    lens = jnp.full((B,), T, jnp.int32)
    fn = jax.jit(
        lambda x, lens, h0, u=unroll: gru_scan_bidi_fused(
            x, lens, w_if, w_ib, w_hf, w_hb,
            zeros3, zeros3, zeros3, zeros3, h0, h0, unroll=u,
        )
    )
    try:
        out = fn(x, lens, h0)
        _ = float(np.asarray(out[0][0, 0, 0]))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(x, lens, h0)
        _ = float(np.asarray(out[0][0, 0, 0]))
        dt = (time.perf_counter() - t0) / ITERS
    except Exception as e:  # VMEM overflow etc. — record and continue
        results.append(
            {"B": B, "unroll": unroll, "error": f"{type(e).__name__}"}
        )
        print(f"B={B} unroll={unroll}: {type(e).__name__}", flush=True)
        continue
    flops = 2 * 2 * T * B * (D + H) * 3 * H
    tflops = flops / dt / 1e12
    rec = {
        "B": B,
        "unroll": unroll,
        "ms": round(dt * 1e3, 2),
        "tflops": round(tflops, 1),
        "pct_roofline": round(tflops / ROOFLINE_TFLOPS * 100, 1),
    }
    results.append(rec)
    print(
        f"B={B} unroll={unroll}: {dt*1e3:7.2f} ms  {tflops:6.1f} TFLOP/s "
        f"({rec['pct_roofline']:.1f} %)",
        flush=True,
    )

with open(os.path.join(REPO, "benchmarks", "gru_fused_mfu.json"), "w") as f:
    json.dump(
        {
            "setup": f"fused bidi GRU layer, T={T}, D={D}, H={H}, bf16 "
            f"weights/streams, f32 gates, TPU v5e, ITERS={ITERS}",
            "results": results,
        },
        f,
        indent=1,
    )
