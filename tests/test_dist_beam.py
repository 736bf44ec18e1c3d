"""Beam-sharded (cross-chip) search vs the single-device decoder.

Runs on the CPU-simulated 8-device mesh (conftest); the global merged
front each step is identical to the single-device decoder's, so the
decoded strings and scores must match.
"""

import numpy as np
import jax.numpy as jnp

from danspeech_tpu.decode.device_beam import ctc_beam_search_device
from danspeech_tpu.decode.dist_beam import ctc_beam_search_beam_sharded
from danspeech_tpu.parallel.mesh import make_mesh

LABELS = "_abcdefghijklmnopqrstuvwxyzæøåéü "


def test_beam_sharded_matches_single_device():
    rng = np.random.default_rng(0)
    c = len(LABELS)
    b, t, w = 2, 18, 16
    probs = jnp.asarray(
        rng.dirichlet(np.ones(c) * 0.2, size=(b, t)).astype(np.float32)
    )
    lengths = jnp.asarray(np.array([t, 13], np.int32))

    mesh = make_mesh()  # 8x1 CPU mesh
    lab_s, tim_s, len_s, sc_s = ctc_beam_search_beam_sharded(
        probs, lengths, mesh, beam_width=w
    )
    lab_d, tim_d, len_d, sc_d = ctc_beam_search_device(
        probs, lengths, beam_width=w
    )

    # top half of the beam (clearly separated scores) must agree exactly
    k = w // 2
    np.testing.assert_allclose(
        np.asarray(sc_s)[:, :k], np.asarray(sc_d)[:, :k], rtol=1e-5, atol=1e-5
    )
    for row in range(b):
        for beam in range(k):
            n = int(np.asarray(len_d)[row, beam])
            assert int(np.asarray(len_s)[row, beam]) == n
            np.testing.assert_array_equal(
                np.asarray(lab_s)[row, beam, :n],
                np.asarray(lab_d)[row, beam, :n],
            )
