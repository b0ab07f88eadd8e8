"""ORBvoc.txt format round-trip + independent-descent validation.

The real ORBvoc.txt is not fetchable in this environment (zero egress), so
the loader is validated two ways: (a) save->load round trip must preserve
every word assignment and BoW score; (b) the vectorized ``transform`` is
cross-checked against an independent pure-Python recursive descent
implementing DBoW2's ``TemplatedVocabulary::transform`` semantics.
"""

import numpy as np
import jax.numpy as jnp

from gsorb_slam_tpu.frontend.vocab import (
    Vocabulary,
    build_vocabulary,
    load_orbvoc_text,
    save_orbvoc_text,
    score_l1,
)


def _rand_desc(rng, n):
    return rng.integers(0, 2**32, (n, 8), dtype=np.uint32)


def _popcount_rows(a, b):
    x = np.bitwise_xor(a, b)
    return sum(bin(int(v)).count("1") for v in x)


def _descend_reference(voc: Vocabulary, d: np.ndarray) -> int:
    """Independent recursive descent (DBoW2 transform semantics)."""
    node = 0
    for _ in range(voc.L):
        best, bd = -1, 1 << 30
        for c in voc.children[node]:
            if c < 0:
                continue
            dist = _popcount_rows(voc.node_desc[c], d)
            if dist < bd:
                bd, best = dist, int(c)
        if best < 0:
            break
        node = best
    return int(voc.word_id[node])


def test_transform_matches_reference_descent(rng):
    train = _rand_desc(rng, 400)
    voc = build_vocabulary(train, k=4, L=3, seed=1)
    q = _rand_desc(rng, 40)
    wid, _ = voc.transform(jnp.asarray(q), jnp.ones(40, bool))
    wid = np.asarray(wid)
    for i in range(40):
        assert wid[i] == _descend_reference(voc, q[i]), i


def test_orbvoc_text_roundtrip(rng, tmp_path):
    train = _rand_desc(rng, 500)
    voc = build_vocabulary(train, k=5, L=3, seed=2)
    path = str(tmp_path / "voc.txt")
    save_orbvoc_text(voc, path)
    voc2 = load_orbvoc_text(path)
    assert voc2.k == voc.k and voc2.L == voc.L
    assert voc2.n_words == voc.n_words

    q = _rand_desc(rng, 64)
    valid = np.ones(64, bool)
    wid1, w1 = voc.transform(jnp.asarray(q), jnp.asarray(valid))
    wid2, w2 = voc2.transform(jnp.asarray(q), jnp.asarray(valid))
    # Word IDS may be renumbered by the BFS save order; word PARTITIONS and
    # weights must agree: same-word pairs stay same-word, weights match.
    wid1, wid2 = np.asarray(wid1), np.asarray(wid2)
    same1 = wid1[:, None] == wid1[None, :]
    same2 = wid2[:, None] == wid2[None, :]
    np.testing.assert_array_equal(same1, same2)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), rtol=1e-5)

    # BoW scores invariant under renumbering.
    a1 = voc.bow_vector(jnp.asarray(q[:32]), jnp.ones(32, bool))
    b1 = voc.bow_vector(jnp.asarray(q[32:]), jnp.ones(32, bool))
    a2 = voc2.bow_vector(jnp.asarray(q[:32]), jnp.ones(32, bool))
    b2 = voc2.bow_vector(jnp.asarray(q[32:]), jnp.ones(32, bool))
    assert abs(score_l1(a1, b1) - score_l1(a2, b2)) < 1e-5


def test_orbvoc_text_header_and_lines(rng, tmp_path):
    """File structure matches the ORBvoc.txt layout the reference parses
    (System::LoadVocabulary -> loadFromTextFile): header 'k L s w', then
    'parent is_leaf 32xbyte weight' per node."""
    train = _rand_desc(rng, 200)
    voc = build_vocabulary(train, k=3, L=2, seed=3)
    path = str(tmp_path / "voc.txt")
    save_orbvoc_text(voc, path)
    lines = open(path).read().strip().splitlines()
    k, L, s, w = lines[0].split()
    assert (int(k), int(L)) == (3, 2)
    for ln in lines[1:]:
        parts = ln.split()
        assert len(parts) == 35  # parent, is_leaf, 32 bytes, weight
        assert all(0 <= int(b) <= 255 for b in parts[2:34])
