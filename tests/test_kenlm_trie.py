"""KenLM trie binary reader/writer (decode/kenlm_trie.py).

No kenlm toolchain exists in the image, so the layout is validated by
round-trip (writer -> reader) plus scoring parity against the NgramLM
backoff oracle and the probing reader — the documented guarantee of
VERDICT r1 item 6. Also checks that trie binaries flow through load_lm,
the beam decoder, and (via to_ngram_lm) the device LM packer.
"""

import numpy as np
import pytest

from danspeech_tpu.decode.kenlm_reader import write_kenlm_probing, load_kenlm_probing
from danspeech_tpu.decode.kenlm_trie import (
    load_kenlm_trie,
    parse_kenlm_trie,  # noqa: F401 (re-exported for other tests)
    write_kenlm_trie,
    MODEL_ARRAY_TRIE,
    MODEL_QUANT_ARRAY_TRIE,
    MODEL_QUANT_TRIE,
)
from danspeech_tpu.decode.lm import NgramLM, load_lm

LABELS = "_abcdefghijklmnopqrstuvwxyz "


def _random_lm(seed=0, order=3, n_words=25):
    """Random SUFFIX-CLOSED LM: like every kenlm-built model, if an n-gram
    exists all its suffixes exist. (On a non-closed LM the trie's
    longest-match walk and the probing/backoff recursion legitimately
    diverge when a 'hole' has a deeper real extension; kenlm's builder
    closes the model, so closed LMs are the parity fixture.)"""
    rng = np.random.default_rng(seed)
    chars = LABELS[1:-1]
    words = set()
    while len(words) < n_words:
        n = rng.integers(1, 6)
        words.add("".join(chars[i] for i in rng.integers(0, len(chars), n)))
    words = sorted(words)
    lm = NgramLM(order)
    for w in words:
        lm.add_ngram((w,), float(rng.uniform(-4, -0.5)), float(rng.uniform(-1, 0)))
    for _ in range(n_words * 3):
        pair = tuple(words[i] for i in rng.integers(0, n_words, 2))
        lm.add_ngram(pair, float(rng.uniform(-3, -0.2)), float(rng.uniform(-1, 0)))
    if order >= 3:
        for _ in range(n_words * 3):
            tri = tuple(words[i] for i in rng.integers(0, n_words, 3))
            lm.add_ngram(tri, float(rng.uniform(-2, -0.1)))
    if order >= 4:
        for _ in range(n_words * 3):
            four = tuple(words[i] for i in rng.integers(0, n_words, 4))
            lm.add_ngram(four, float(rng.uniform(-2, -0.1)))
    # suffix closure
    for n in range(order, 2, -1):
        for ids in list(lm.tables[n - 1]):
            suffix = ids[1:]
            while len(suffix) >= 2 and suffix not in lm.tables[len(suffix) - 1]:
                lm.tables[len(suffix) - 1][suffix] = (
                    float(rng.uniform(-3, -0.2)),
                    float(rng.uniform(-1, 0)),
                )
                suffix = suffix[1:]
    return lm, words


@pytest.mark.parametrize("order", [2, 3, 4])
def test_roundtrip_scoring_parity(tmp_path, order):
    lm, words = _random_lm(seed=order, order=order)
    path = str(tmp_path / "test_trie.klm")
    write_kenlm_trie(lm, path)
    trie = load_kenlm_trie(path)

    assert trie.order == order
    rng = np.random.default_rng(1)
    checked = 0
    for _ in range(300):
        k = int(rng.integers(0, order))
        ctx = [words[i] for i in rng.integers(0, len(words), k)]
        w = words[int(rng.integers(0, len(words)))]
        expected = lm.score_word(list(ctx), w)
        got = trie.score_word(list(ctx), w)
        # trie stores log10 as float32: compare at float32 resolution
        np.testing.assert_allclose(got, expected, rtol=2e-6, atol=2e-6)
        checked += 1
    assert checked == 300
    # OOV
    assert trie.score_word([], "zzzzzzz") == -1000.0


def test_trie_matches_probing_reader(tmp_path):
    """Both binary readers score identically from the same source LM."""
    lm, words = _random_lm(seed=7, order=3)
    ppath = str(tmp_path / "p.klm")
    tpath = str(tmp_path / "t.klm")
    write_kenlm_probing(lm, ppath)
    write_kenlm_trie(lm, tpath)
    probing = load_kenlm_probing(ppath)
    trie = load_kenlm_trie(tpath)

    rng = np.random.default_rng(2)
    for _ in range(200):
        k = int(rng.integers(0, 3))
        ctx = [words[i] for i in rng.integers(0, len(words), k)]
        w = words[int(rng.integers(0, len(words)))]
        np.testing.assert_allclose(
            trie.score_word(list(ctx), w),
            probing.score_word(list(ctx), w),
            rtol=2e-6,
            atol=2e-6,
        )


def test_load_lm_dispatches_trie(tmp_path):
    lm, words = _random_lm(seed=3, order=2)
    path = str(tmp_path / "auto.klm")
    write_kenlm_trie(lm, path)
    loaded = load_lm(path)
    from danspeech_tpu.decode.kenlm_trie import KenLMTrieModel

    assert isinstance(loaded, KenLMTrieModel)
    w = words[0]
    np.testing.assert_allclose(
        loaded.score_word([], w), lm.score_word([], w), rtol=2e-6, atol=2e-6
    )


def test_to_ngram_lm_enumerates_everything(tmp_path):
    lm, words = _random_lm(seed=5, order=3)
    path = str(tmp_path / "walk.klm")
    write_kenlm_trie(lm, path)
    trie = load_kenlm_trie(path)
    back = trie.to_ngram_lm()

    # every original n-gram survives with its prob (float32 resolution)
    for table in lm.tables:
        for ids, (p, b) in table.items():
            ngram = tuple(lm.words[i] for i in ids)
            back_ids = tuple(back.vocab[w] for w in ngram)
            bp, bb = back.tables[len(ids) - 1][back_ids]
            np.testing.assert_allclose(bp, p, rtol=2e-6, atol=2e-6)
            if len(ids) < lm.order:
                np.testing.assert_allclose(bb, b, rtol=2e-6, atol=2e-6)


def test_trie_feeds_device_lm(tmp_path):
    """trie .klm -> to_ngram_lm -> device hash tables -> on-device scores."""
    import jax.numpy as jnp

    from danspeech_tpu.decode.device_lm import pack_device_lm, score_word_ids

    lm, words = _random_lm(seed=9, order=2, n_words=12)
    path = str(tmp_path / "dev.klm")
    write_kenlm_trie(lm, path)
    back = load_kenlm_trie(path).to_ngram_lm()
    dlm = pack_device_lm(back, LABELS)

    rng = np.random.default_rng(3)
    ctxs, wids, expected = [], [], []
    for _ in range(50):
        c = int(rng.integers(0, len(back.words)))
        w = int(rng.integers(0, len(back.words)))
        ctxs.append([c])
        wids.append(w)
        expected.append(back.score_word_ids((c,), w))
    got = np.asarray(
        score_word_ids(dlm, jnp.asarray(ctxs, jnp.int32), jnp.asarray(wids, jnp.int32))
    )
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_beam_decoder_accepts_trie_klm(tmp_path):
    from danspeech_tpu.decode.beam import BeamCTCDecoder

    lm, words = _random_lm(seed=11, order=2, n_words=10)
    path = str(tmp_path / "beam.klm")
    write_kenlm_trie(lm, path)
    rng = np.random.default_rng(4)
    probs = rng.dirichlet(np.ones(len(LABELS)), size=(1, 30)).astype(np.float32)

    d_trie = BeamCTCDecoder(LABELS, lm_path=path, alpha=1.0, beta=0.3, beam_width=8)
    d_ref = BeamCTCDecoder(LABELS, lm_path=lm, alpha=1.0, beta=0.3, beam_width=8)
    st, _ = d_trie.decode(probs)
    sr, _ = d_ref.decode(probs)
    assert st[0][0] == sr[0][0]


# ---------------------------------------------------------------------------
# Quantized (-q/-b) and Bhiksha (-a) variants (VERDICT r2 item 6)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "quantized,bhiksha,model_type",
    [
        (True, False, MODEL_QUANT_TRIE),
        (False, True, MODEL_ARRAY_TRIE),
        (True, True, MODEL_QUANT_ARRAY_TRIE),
    ],
)
@pytest.mark.parametrize("order", [2, 3, 4])
def test_variant_roundtrip_scoring_parity(
    tmp_path, order, quantized, bhiksha, model_type
):
    """With 8-bit tables the test LMs have fewer distinct probs/backoffs
    than bins, so quantization is lossless and scoring parity is exact at
    float32 resolution — same oracle method as the plain trie."""
    lm, words = _random_lm(seed=order, order=order)
    path = str(tmp_path / "variant.klm")
    write_kenlm_trie(lm, path, quantized=quantized, bhiksha=bhiksha)

    data = open(path, "rb").read()
    assert int.from_bytes(data[96:100], "little") == model_type
    trie = load_kenlm_trie(path)
    assert trie.order == order

    rng = np.random.default_rng(1)
    for _ in range(300):
        k = int(rng.integers(0, order))
        ctx = [words[i] for i in rng.integers(0, len(words), k)]
        w = words[int(rng.integers(0, len(words)))]
        np.testing.assert_allclose(
            trie.score_word(list(ctx), w),
            lm.score_word(list(ctx), w),
            rtol=2e-6,
            atol=2e-6,
        )
    assert trie.score_word([], "zzzzzzz") == -1000.0


def test_low_bit_quantization_bounded_error(tmp_path):
    """4-bit tables are lossy: scores must still be within the worst bin
    width of the oracle (per term, <= order terms per score)."""
    lm, words = _random_lm(seed=13, order=3)
    path = str(tmp_path / "q4.klm")
    write_kenlm_trie(lm, path, quantized=True, prob_bits=4, backoff_bits=4)
    trie = load_kenlm_trie(path)

    # worst-case per-table quantization error in natural-log space
    from danspeech_tpu.decode.lm import LOG10

    max_err = 0.0
    for mid in trie._middles:
        for bins in (mid.prob_bins, mid.backoff_bins):
            c = np.sort(bins.centers.astype(np.float64))
            max_err = max(max_err, float(np.diff(c).max(initial=0.0)))
    c = np.sort(trie._longest.prob_bins.centers.astype(np.float64))
    max_err = max(max_err, float(np.diff(c).max(initial=0.0)))
    tol = LOG10 * max_err * lm.order + 1e-6

    rng = np.random.default_rng(5)
    for _ in range(200):
        k = int(rng.integers(0, 3))
        ctx = [words[i] for i in rng.integers(0, len(words), k)]
        w = words[int(rng.integers(0, len(words)))]
        assert abs(trie.score_word(list(ctx), w) - lm.score_word(list(ctx), w)) <= tol


def test_bhiksha_offsets_smaller_inline_bits(tmp_path):
    """-a actually chops next-pointer bits (the point of the format) and
    the walk over the compressed pointers still enumerates everything."""
    lm, _ = _random_lm(seed=17, order=3, n_words=40)
    plain = str(tmp_path / "plain.klm")
    packed = str(tmp_path / "bhiksha.klm")
    write_kenlm_trie(lm, plain)
    write_kenlm_trie(lm, packed, bhiksha=True)

    t_plain = load_kenlm_trie(plain)
    t_bhik = load_kenlm_trie(packed)
    assert any(
        b.next_bits < p.next_bits and b.offsets is not None
        for p, b in zip(t_plain._middles, t_bhik._middles)
    )
    a, b = t_plain.to_ngram_lm(), t_bhik.to_ngram_lm()
    assert a.tables == b.tables


def test_variant_flows_through_load_lm_and_device(tmp_path):
    """quantized+bhiksha .klm -> load_lm -> to_ngram_lm -> device packer."""
    from danspeech_tpu.decode.device_lm import pack_device_lm
    from danspeech_tpu.decode.kenlm_trie import KenLMTrieModel

    lm, words = _random_lm(seed=19, order=3, n_words=12)
    path = str(tmp_path / "qa.klm")
    write_kenlm_trie(lm, path, quantized=True, bhiksha=True)
    loaded = load_lm(path)
    assert isinstance(loaded, KenLMTrieModel)
    np.testing.assert_allclose(
        loaded.score_word([words[1]], words[0]),
        lm.score_word([words[1]], words[0]),
        rtol=2e-6, atol=2e-6,
    )
    dlm = pack_device_lm(loaded.to_ngram_lm(), LABELS)
    assert dlm.order == 3
