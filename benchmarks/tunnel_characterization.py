"""Characterize the axon host<->device tunnel that carries all serving I/O.

In this environment the TPU chip sits behind a stdio-multiplexed relay
(every PJRT transfer shares one pipe with the agent session), and its
behavior sets a hard ceiling on what the PUBLIC serving path can deliver,
independent of our code:

1. **Bulk H2D uploads are fast only until the first D2H result fetch.**
   After any `np.asarray(device_array)` (even of a scalar), subsequent
   large `device_put`s drop from ~0.4-1.4 GB/s to a flat ~15-50 MB/s for
   the life of the process. Compiles and executes do NOT trigger this;
   the first fetch does (measured: AOT-compile -> puts fast; execute
   without fetch -> puts fast; fetch -> puts ~700 ms/32 MB thereafter).
2. The slow mode is insensitive to put size (8 MB..134 MB all land at
   ~15-50 MB/s), to threading (6 parallel puts aggregate ~50 MB/s), and
   to content entropy (no compression in the relay).
3. Per-round-trip dispatch+fetch latency is ~30 ms.
4. `jax.experimental.io_callback` hangs on this backend (no host-callback
   escape hatch for result delivery), and axon->cpu-backend device_put of
   a result takes minutes — there is no fetch path that avoids the mode
   switch.

Consequence for serving throughput: a transcription service must both
upload waveforms and fetch transcripts, so steady state runs in the
post-fetch mode. At 16 kHz/int16, one audio-second is 32 KB, so the
observed 15-50 MB/s band maps to roughly 600-1,600 audio-s/s of tunnel
ceiling — the band drifts run to run, so compare any public-path figure
against the `post_fetch_put_MBps` recorded in THIS file's committed JSON
(tunnel_characterization.json) and the public/device split in the
matching BENCH_r*.json, not against numbers pinned in prose. The public
`transcribe_batch` measures at that ceiling while the identical workload
with inputs pre-staged on device runs ~5x higher. The gap
is the relay, not host software: staging buffers are pinned and reused,
transfers are int16 (half of float32), path ids come back as uint8, and
the per-group collapse is one vectorized pass (engine.py:_transcribe_
pipelined). On a real TPU host (PCIe >= 16 GB/s per direction) the same
code is compute-bound at the device-pipeline figure.

Run: `python benchmarks/tunnel_characterization.py` (takes ~1 min; do
not run concurrently with another TPU process). Writes
benchmarks/tunnel_characterization.json.
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
import jax.numpy as jnp  # noqa: E402

MB32 = (128, 128000)  # one 8 s x 128-row serving group, int16


def timed_put(rng, shape=MB32, reps=3):
    """Median wall time of a fresh-content device_put (+ completion)."""
    ts = []
    for _ in range(reps):
        buf = rng.integers(-3000, 3000, shape).astype(np.int16)
        t0 = time.perf_counter()
        jax.device_put(buf).block_until_ready()
        ts.append(time.perf_counter() - t0)
    mb = np.prod(shape) * 2 / 1e6
    med = sorted(ts)[len(ts) // 2]
    return round(med * 1e3, 1), round(mb / med, 1)


def main():
    rng = np.random.default_rng(0)
    jax.device_put(np.ones(1000, np.int16)).block_until_ready()  # warm

    pre_ms, pre_mbs = timed_put(rng)

    # compile + execute WITHOUT any fetch
    f = jax.jit(lambda a: (a * 2).astype(jnp.uint8))
    r = f(jax.device_put(rng.integers(0, 100, (64, 400)).astype(np.int32)))
    r.block_until_ready()
    post_exec_ms, post_exec_mbs = timed_put(rng)

    # first D2H fetch -> slow mode
    _ = np.asarray(r)
    post_fetch_ms, post_fetch_mbs = timed_put(rng)

    # round-trip latency
    g = jax.jit(lambda a: a + 1)
    s = jax.device_put(np.ones(8, np.float32))
    np.asarray(g(s))
    t0 = time.perf_counter()
    for _ in range(10):
        np.asarray(g(s))
    rt_ms = (time.perf_counter() - t0) / 10 * 1e3

    artifact = {
        "setup": "axon stdio relay to 1x TPU v5e; fresh process; "
        "32.8 MB int16 puts (one 8s x 128-row serving group)",
        "h2d_before_any_fetch": {"ms": pre_ms, "MB_per_s": pre_mbs},
        "h2d_after_execute_no_fetch": {
            "ms": post_exec_ms,
            "MB_per_s": post_exec_mbs,
        },
        "h2d_after_first_fetch": {
            "ms": post_fetch_ms,
            "MB_per_s": post_fetch_mbs,
        },
        "roundtrip_latency_ms": round(rt_ms, 1),
        "serving_ceiling_audio_s_per_s": round(
            post_fetch_mbs * 1e6 / (16000 * 2), 0
        ),
        "note": "ceiling = post-fetch MB/s divided by 32 KB per int16 "
        "audio-second; the public transcribe_batch path must upload "
        "waveforms AND fetch transcripts, so steady state runs in the "
        "post-fetch mode",
        "machine": os.uname().nodename,
        "measured": time.strftime("%Y-%m-%d"),
    }
    out = os.path.join(REPO, "benchmarks", "tunnel_characterization.json")
    with open(out, "w") as fjson:
        json.dump(artifact, fjson, indent=2)
    print(json.dumps(artifact, indent=2))


if __name__ == "__main__":
    main()
