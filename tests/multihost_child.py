"""Child worker for tests/test_multihost.py.

Runs as one of two jax.distributed processes (CPU backend, 4 virtual
devices each -> one 8-device global mesh), executes the DP batch forward
over the GLOBAL mesh, greedy-decodes the rows this process can address,
and writes "row_index\ttranscript" lines to its output file.

Usage: python multihost_child.py <process_id> <coordinator_port> <outdir>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    process_id = int(sys.argv[1])
    port = int(sys.argv[2])
    outdir = sys.argv[3]

    from danspeech_tpu.parallel.mesh import initialize_multihost, make_mesh

    initialize_multihost(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=process_id,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4

    from test_multihost import build_fixture  # shared with the parent test

    model, waves = build_fixture()

    from danspeech_tpu.decode.greedy import collapse_batch
    from danspeech_tpu.parallel.batch import ShardedTranscriber

    mesh = make_mesh(n_data=8, n_model=1)
    tr = ShardedTranscriber(model, mesh, shard_model_params=False)

    # global (B, S) batch is identical in every process; each process
    # serves the shards its local devices own
    b_pad = -(-len(waves) // 8) * 8
    maxlen = max(
        tr.SAMPLE_BUCKET,
        -(-max(len(w) for w in waves) // tr.SAMPLE_BUCKET) * tr.SAMPLE_BUCKET,
    )
    batch = np.zeros((b_pad, maxlen), dtype=np.float32)
    lengths = np.ones((b_pad,), dtype=np.int32)
    for i, w in enumerate(waves):
        batch[i, : len(w)] = w
        lengths[i] = len(w)

    in_shard = NamedSharding(mesh, P("data"))
    garr = jax.make_array_from_callback(
        batch.shape, in_shard, lambda idx: batch[idx]
    )
    glens = jax.make_array_from_callback(
        lengths.shape, in_shard, lambda idx: lengths[idx]
    )
    probs, out_lens = tr._run(tr.params, garr, glens)

    # decode the rows this process holds
    labels = model.labels
    rows = []
    lens_by_start = {
        (ls.index[0].start or 0): np.asarray(ls.data)
        for ls in out_lens.addressable_shards
    }
    for shard in probs.addressable_shards:
        row0 = shard.index[0].start or 0
        p = np.asarray(shard.data)
        lens_here = lens_by_start[row0]
        paths = p.argmax(axis=-1)
        strings = collapse_batch(paths, lens_here, labels, labels.index("_"))
        for j, s in enumerate(strings):
            if row0 + j < len(waves):
                rows.append((row0 + j, s))

    with open(os.path.join(outdir, f"proc{process_id}.tsv"), "w") as f:
        for i, s in sorted(rows):
            f.write(f"{i}\t{s}\n")
    print(f"proc {process_id}: wrote {len(rows)} rows", flush=True)


if __name__ == "__main__":
    main()
