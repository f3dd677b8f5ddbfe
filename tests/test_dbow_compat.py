"""DBoW2 vocabulary compatibility: format loaders, tree assignment, scoring."""

import os

import numpy as np
import jax.numpy as jnp

from tpuslam.place import dbow_compat as dc


def _write_text_vocab(path, k, L, rows):
    """rows: list of (parent, is_leaf, 32 bytes, weight)."""
    with open(path, "w") as f:
        f.write(f"{k} {L} 0 0\n")
        for parent, is_leaf, desc, weight in rows:
            f.write(
                f"{parent} {is_leaf} " + " ".join(str(int(b)) for b in desc) + f" {weight}\n"
            )


def _write_binary_vocab(path, k, L, rows):
    size_node = 4 + 32 + 4 + 1
    with open(path, "wb") as f:
        f.write(np.array([len(rows), size_node], np.uint32).tobytes())
        f.write(np.array([k, L, 0, 0], np.int32).tobytes())
        for parent, is_leaf, desc, weight in rows:
            f.write(np.array([parent], np.int32).tobytes())
            f.write(np.asarray(desc, np.uint8).tobytes())
            f.write(np.array([weight], np.float32).tobytes())
            f.write(np.array([is_leaf], np.uint8).tobytes())


def _toy_rows(rng):
    """k=2, L=2 tree: root -> 2 inner nodes -> 4 leaves.

    Node ids (implicit, in file order): 1, 2 inner (parent 0);
    3, 4 leaves under 1; 5, 6 leaves under 2."""
    descs = rng.randint(0, 256, (6, 32)).astype(np.uint8)
    # make the two subtrees far apart in Hamming space: subtree 1 = low bits,
    # subtree 2 = high bits
    descs[0] = 0x00
    descs[1] = 0xFF
    descs[2] = descs[0] ^ np.asarray([1] + [0] * 31, np.uint8)  # near inner 1
    descs[3] = descs[0] ^ np.asarray([3] + [0] * 31, np.uint8)
    descs[4] = descs[1] ^ np.asarray([1] + [0] * 31, np.uint8)  # near inner 2
    descs[5] = descs[1] ^ np.asarray([3] + [0] * 31, np.uint8)
    rows = [
        (0, 0, descs[0], 0.0),
        (0, 0, descs[1], 0.0),
        (1, 1, descs[2], 0.5),
        (1, 1, descs[3], 0.7),
        (2, 1, descs[4], 0.9),
        (2, 1, descs[5], 1.1),
    ]
    return rows, descs


def test_text_binary_loaders_agree(tmp_path):
    rng = np.random.RandomState(0)
    rows, _ = _toy_rows(rng)
    tpath = os.path.join(tmp_path, "voc.txt")
    bpath = os.path.join(tmp_path, "voc.bin")
    _write_text_vocab(tpath, 2, 2, rows)
    _write_binary_vocab(bpath, 2, 2, rows)
    tv_t = dc.load_vocabulary(tpath)
    tv_b = dc.load_vocabulary(bpath)
    assert tv_t.k == tv_b.k == 2 and tv_t.depth == tv_b.depth == 2
    np.testing.assert_array_equal(np.asarray(tv_t.children), np.asarray(tv_b.children))
    np.testing.assert_array_equal(np.asarray(tv_t.node_desc), np.asarray(tv_b.node_desc))
    np.testing.assert_allclose(
        np.asarray(tv_t.node_weight), np.asarray(tv_b.node_weight), rtol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(tv_t.node_word), np.asarray(tv_b.node_word))
    assert tv_t.n_words == 4


def test_native_parser_matches_numpy(tmp_path):
    if not os.path.exists(dc._LIB_PATH):
        import pytest

        pytest.skip("native vocab parser not built")
    rng = np.random.RandomState(1)
    rows, _ = _toy_rows(rng)
    tpath = os.path.join(tmp_path, "voc.txt")
    _write_text_vocab(tpath, 2, 2, rows)
    h_n, d_n = dc._native_parse_text(str(tpath))
    h_p, d_p = dc._numpy_parse_text(str(tpath))
    assert tuple(h_n) == tuple(h_p)
    np.testing.assert_allclose(d_n, d_p, rtol=1e-6)


def test_tree_assignment_and_scoring(tmp_path):
    rng = np.random.RandomState(2)
    rows, descs = _toy_rows(rng)
    tpath = os.path.join(tmp_path, "voc.txt")
    _write_text_vocab(tpath, 2, 2, rows)
    tv = dc.load_vocabulary(tpath)

    # queries exactly equal to the leaf centroids must land on those words
    leaf_desc = np.stack([descs[2], descs[3], descs[4], descs[5]])
    q = jnp.asarray(dc._pack_desc_bytes(leaf_desc))
    valid = jnp.ones(4, bool)
    words, weights = dc.assign_words(tv, q, valid)
    np.testing.assert_array_equal(np.asarray(words), [0, 1, 2, 3])
    np.testing.assert_allclose(np.asarray(weights), [0.5, 0.7, 0.9, 1.1], rtol=1e-6)

    # invalid rows get word -1 and weight 0
    words_iv, weights_iv = dc.assign_words(tv, q, jnp.array([True, False, True, False]))
    assert int(words_iv[1]) == -1 and float(weights_iv[1]) == 0.0

    # sparse BoW: duplicates aggregate, L1-normalized
    w = jnp.array([2, 0, 2, -1, 0, 0], jnp.int32)
    wt = jnp.array([1.0, 0.5, 1.0, 9.0, 0.5, 0.5], jnp.float32)
    uw, uwt = dc.bow_sparse(w, wt)
    got = {int(a): float(b) for a, b in zip(np.asarray(uw), np.asarray(uwt)) if a >= 0}
    np.testing.assert_allclose(got[0], 1.5 / 3.5, rtol=1e-6)
    np.testing.assert_allclose(got[2], 2.0 / 3.5, rtol=1e-6)
    np.testing.assert_allclose(float(jnp.sum(uwt)), 1.0, rtol=1e-6)

    # L1 scores: identical BoW scores 1.0, disjoint scores 0, invalid -1
    db_w = jnp.stack([uw, jnp.array([5, 7, -1, -1, -1, -1], jnp.int32), uw])
    db_wt = jnp.stack([uwt, jnp.array([0.4, 0.6, 0, 0, 0, 0], jnp.float32), uwt])
    db_valid = jnp.array([True, True, False])
    s = dc.l1_scores(uw, uwt, db_w, db_wt, db_valid)
    np.testing.assert_allclose(float(s[0]), 1.0, rtol=1e-5)
    np.testing.assert_allclose(float(s[1]), 0.0, atol=1e-7)
    assert float(s[2]) == -1.0


def test_assignment_matches_host_reference(tmp_path):
    """Random deeper tree: batched device descent == per-descriptor host walk."""
    rng = np.random.RandomState(3)
    k, L = 3, 3
    rows = []
    parents_by_level = [[0]]
    nid = 0
    for lvl in range(L):
        nxt = []
        for p in parents_by_level[-1]:
            for _ in range(k):
                nid += 1
                is_leaf = 1 if lvl == L - 1 else 0
                rows.append((p, is_leaf, rng.randint(0, 256, 32), float(rng.rand())))
                nxt.append(nid)
        parents_by_level.append(nxt)
    tpath = os.path.join(tmp_path, "voc.txt")
    _write_text_vocab(tpath, k, L, rows)
    tv = dc.load_vocabulary(tpath)

    children = np.asarray(tv.children)
    ndesc = np.asarray(tv.node_desc)
    nword = np.asarray(tv.node_word)

    def host_walk(d):
        node = 0
        while True:
            ch = [c for c in children[node] if c >= 0]
            if not ch:
                return nword[node]
            dists = [
                sum(bin(int(x)).count("1") for x in np.bitwise_xor(ndesc[c], d)) for c in ch
            ]
            node = ch[int(np.argmin(dists))]

    q_bytes = rng.randint(0, 256, (32, 32)).astype(np.uint8)
    q = dc._pack_desc_bytes(q_bytes)
    words, _ = dc.assign_words(tv, jnp.asarray(q), jnp.ones(32, bool))
    expect = [host_walk(q[i]) for i in range(32)]
    np.testing.assert_array_equal(np.asarray(words), expect)


def test_load_flat_vocabulary_and_tracker_injection(tmp_path):
    """--vocab path: an ORBvoc file flattens onto the MXU codebook
    (place/vocab.load_flat_vocabulary) and plugs into the Tracker; queries
    equal to leaf centroids land on their own word ids."""
    from tpuslam.place import vocab as vb
    from tpuslam.core.camera import Camera
    from tpuslam.core.config import SlamConfig, Capacities
    from tpuslam.frontend.tracking import Tracker

    rng = np.random.RandomState(4)
    rows, descs = _toy_rows(rng)
    tpath = os.path.join(tmp_path, "voc.txt")
    _write_text_vocab(tpath, 2, 2, rows)
    voc = vb.load_flat_vocabulary(tpath)
    assert voc.n_words == 4
    leaf_desc = np.stack([descs[2], descs[3], descs[4], descs[5]])
    q = jnp.asarray(dc._pack_desc_bytes(leaf_desc))
    words = vb.assign_words(voc, q, jnp.ones(4, bool))
    np.testing.assert_array_equal(np.asarray(words), [0, 1, 2, 3])

    cam = Camera.make(300.0, 300.0, 160.0, 120.0)
    caps = Capacities(max_keypoints=64, max_keyframes=8, max_points=256,
                      max_planes=4, max_cuboids=2, vocab_words=4)
    import dataclasses
    cfg = SlamConfig(caps=caps)
    cfg = cfg.replace(orb=dataclasses.replace(cfg.orb, n_features=64))
    tr = Tracker(cam, cfg, vocab=voc)
    assert tr.loop_closer.vocab is voc
    # a word-count mismatch must be rejected loudly
    import pytest
    with pytest.raises(ValueError):
        Tracker(cam, cfg.replace(caps=dataclasses.replace(caps, vocab_words=8)), vocab=voc)
