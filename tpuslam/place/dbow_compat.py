"""DBoW2 vocabulary compatibility: load ORBvoc files, assign words, score.

The reference boots from a pre-trained ORB vocabulary in DBoW2's text or
binary format (System.cc:69-75; formats defined in Thirdparty/DBoW2/DBoW2/
TemplatedVocabulary.h:1350-1437 text, :1525-1567 binary).  This module lets
a user bring that exact file to the TPU stack:

* :func:`load_vocabulary` parses either format into a :class:`TreeVocabulary`
  of flat device arrays (children table, packed node descriptors, tf-idf
  weights, leaf word ids).  Text parsing uses the native C++ scanner
  (native/vocab_loader.cpp) when built — one strtof pass instead of DBoW2's
  per-line stringstreams — with a numpy fallback.
* :func:`assign_words` replays DBoW2's greedy tree descent (argmin Hamming
  among the k children per level) as L batched gather+popcount steps for all
  descriptors of a frame at once (``jax.lax.population_count`` on the packed
  u32 words — no bit unpacking).
* Large vocabularies (ORBvoc: 10^6 leaves) make dense (K, W) BoW matrices
  impossible, so scoring is sparse: :func:`bow_sparse` aggregates a frame's
  words into a padded (unique-word, weight) list (tf-idf, L1-normalized) and
  :func:`l1_scores` computes DBoW2's L1 score  s(q, d) = sum_w min(q_w, d_w)
  (ScoringObject.cc L1Scoring, equal to 1 - 0.5|q - d|_1 for normalized
  vectors) for the query against every keyframe in one batched program.

For small self-trained codebooks the dense path in place/vocab.py remains
the fast option; the two share word-id semantics so either can feed the
loop closer / relocalizer candidate gates.
"""

from __future__ import annotations

import ctypes
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "io", "_native", "libtpuslam_vocab.so",
)

_BIG = 1e9


class TreeVocabulary(NamedTuple):
    """DBoW2 k-ary vocabulary tree as flat arrays (node 0 = root)."""

    children: jnp.ndarray  # (n_nodes, k) int32 child node ids, -1 padded
    node_desc: jnp.ndarray  # (n_nodes, 8) uint32 packed 256-bit centroids
    node_weight: jnp.ndarray  # (n_nodes,) float32 idf weight (leaves)
    node_word: jnp.ndarray  # (n_nodes,) int32 word id, -1 for inner nodes
    k: int
    depth: int  # L

    @property
    def n_words(self):
        return int((np.asarray(self.node_word) >= 0).sum())


def _native_parse_text(path: str):
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.vocab_parse_text.restype = ctypes.c_void_p
    lib.vocab_parse_text.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.vocab_data.restype = ctypes.POINTER(ctypes.c_float)
    lib.vocab_data.argtypes = [ctypes.c_void_p]
    lib.vocab_free.argtypes = [ctypes.c_void_p]
    rows = ctypes.c_int()
    cols = ctypes.c_int()
    header = (ctypes.c_int * 4)()
    h = lib.vocab_parse_text(path.encode(), ctypes.byref(rows), ctypes.byref(cols), header)
    if not h:
        raise FileNotFoundError(path)
    try:
        n = rows.value * cols.value
        data = np.ctypeslib.as_array(lib.vocab_data(h), shape=(n,)).reshape(
            rows.value, cols.value
        ).copy()
    finally:
        lib.vocab_free(h)
    return tuple(header), data


def _numpy_parse_text(path: str):
    with open(path, "r") as f:
        header = tuple(int(x) for x in f.readline().split()[:4])
        data = np.loadtxt(f, dtype=np.float32)
    if data.ndim == 1:
        data = data[None, :]
    return header, data


def _pack_desc_bytes(desc_bytes):
    """(n, 32) uint8 -> (n, 8) uint32 little-endian, matching
    kernels/orb.py's bit packing (bit i of byte b = pattern bit 8b+i)."""
    return desc_bytes.astype(np.uint8).reshape(-1, 8, 4).view(np.uint32)[..., 0].reshape(-1, 8)


def _build_tree(header, mat):
    """Rows of (parent, is_leaf, d0..d31, weight) -> TreeVocabulary arrays."""
    k, L = int(header[0]), int(header[1])
    n_nodes = mat.shape[0] + 1  # + root
    parent = mat[:, 0].astype(np.int64)
    is_leaf = mat[:, 1] > 0.5
    desc = np.clip(mat[:, 2:34], 0, 255).astype(np.uint8)
    weight = mat[:, 34].astype(np.float32)

    children = np.full((n_nodes, k), -1, np.int32)
    slot = np.zeros(n_nodes, np.int32)
    node_ids = np.arange(1, n_nodes, dtype=np.int64)
    for nid, pid in zip(node_ids, parent):  # single linear pass
        s = slot[pid]
        if s < k:
            children[pid, s] = nid
            slot[pid] = s + 1

    node_desc = np.zeros((n_nodes, 8), np.uint32)
    node_desc[1:] = _pack_desc_bytes(desc)
    node_weight = np.zeros(n_nodes, np.float32)
    node_weight[1:] = weight
    node_word = np.full(n_nodes, -1, np.int32)
    node_word[1:][is_leaf] = np.arange(int(is_leaf.sum()), dtype=np.int32)

    return TreeVocabulary(
        children=jnp.asarray(children),
        node_desc=jnp.asarray(node_desc),
        node_weight=jnp.asarray(node_weight),
        node_word=jnp.asarray(node_word),
        k=k,
        depth=L,
    )


def load_vocabulary_text(path: str) -> TreeVocabulary:
    """DBoW2 text format (TemplatedVocabulary.h:1350-1437): header
    "k L scoring weighting", then "parent is_leaf d0..d31 weight" per node."""
    parsed = _native_parse_text(path)
    if parsed is None:
        parsed = _numpy_parse_text(path)
    header, data = parsed
    if data.shape[1] != 35:
        raise ValueError(f"unexpected vocab row width {data.shape[1]} (want 35)")
    return _build_tree(header, data)


def load_vocabulary_binary(path: str) -> TreeVocabulary:
    """ORB-SLAM2-fork binary format (TemplatedVocabulary.h:1525-1567):
    header u32 nb_nodes, u32 size_node, i32 k, i32 L, i32 scoring,
    i32 weighting; then per node: i32 parent, 32 bytes descriptor,
    f32 weight, u8 is_leaf (size_node bytes each)."""
    raw = np.fromfile(path, np.uint8)
    nb_nodes, size_node = raw[:8].view(np.uint32)[:2]
    k, L = raw[8:16].view(np.int32)[:2]
    body = raw[24 : 24 + int(nb_nodes) * int(size_node)]
    rows = body.reshape(int(nb_nodes), int(size_node))
    parent = rows[:, 0:4].copy().view(np.int32)[:, 0].astype(np.float32)
    desc = rows[:, 4:36].astype(np.float32)
    weight = rows[:, 36:40].copy().view(np.float32)[:, 0]
    is_leaf = (rows[:, 40] != 0).astype(np.float32)
    mat = np.column_stack([parent, is_leaf, desc, weight]).astype(np.float32)
    return _build_tree((int(k), int(L), 0, 0), mat)


def load_vocabulary(path: str) -> TreeVocabulary:
    if path.endswith(".bin"):
        return load_vocabulary_binary(path)
    return load_vocabulary_text(path)


# ---------------------------------------------------------------------------
# Word assignment + sparse scoring (device programs)
# ---------------------------------------------------------------------------


def _hamming_packed(a_u32, b_u32):
    """(..., 8) x (..., 8) packed uint32 -> (...,) popcount Hamming."""
    x = jnp.bitwise_xor(a_u32, b_u32)
    return jnp.sum(jax.lax.population_count(x).astype(jnp.int32), axis=-1)


def assign_words(tv: TreeVocabulary, desc_u32, valid):
    """Greedy DBoW2 tree descent for all descriptors at once.

    (N, 8) packed descriptors -> ((N,) word ids, (N,) idf weights); invalid
    or unassigned rows get word -1 / weight 0.  L batched steps of
    gather(k children) + packed popcount + argmin (TemplatedVocabulary.h
    transform()'s per-descriptor loop, vectorized)."""
    n = desc_u32.shape[0]
    node = jnp.zeros((n,), jnp.int32)
    for _ in range(tv.depth + 1):  # +1: leaves can sit one level deeper
        ch = tv.children[node]  # (N, k)
        chd = tv.node_desc[ch]  # (N, k, 8)
        dist = _hamming_packed(chd, desc_u32[:, None, :])  # (N, k)
        dist = jnp.where(ch >= 0, dist, jnp.int32(1 << 30))
        best = jnp.argmin(dist, axis=1).astype(jnp.int32)
        nxt = jnp.take_along_axis(ch, best[:, None], axis=1)[:, 0]
        node = jnp.where(nxt >= 0, nxt, node)  # stop at leaves
    word = tv.node_word[node]
    word = jnp.where(valid, word, -1)
    weight = jnp.where(word >= 0, tv.node_weight[node], 0.0)
    return word, weight


def bow_sparse(words, weights):
    """Aggregate per-descriptor (word, idf) into a padded sparse BoW vector.

    Returns (uwords (N,), uweights (N,)): duplicate words carry their summed
    tf-idf mass on the FIRST occurrence (slot in sorted order) and 0 on the
    rest; L1-normalized.  Shapes stay static — the DBoW2 analogue is the
    std::map BowVector (BowVector.cpp addWeight + normalize)."""
    n = words.shape[0]
    order = jnp.argsort(jnp.where(words >= 0, words, jnp.int32(2**30)))
    w = words[order]
    wt = jnp.where(w >= 0, weights[order], 0.0)
    is_start = jnp.concatenate([jnp.array([True]), w[1:] != w[:-1]])
    run_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    run_mass = jax.ops.segment_sum(wt, run_id, num_segments=n)  # mass per run
    mass = jnp.where(is_start, run_mass[run_id], 0.0)
    uwords = jnp.where((w >= 0) & (mass > 0), w, -1)
    mass = jnp.where(uwords >= 0, mass, 0.0)
    total = jnp.maximum(jnp.sum(mass), 1e-12)
    return uwords, mass / total


@jax.jit
def l1_scores(q_words, q_weights, db_words, db_weights, db_valid):
    """DBoW2 L1 score of one query BoW against K keyframe BoWs.

    q_*: (N,) sparse BoW (from :func:`bow_sparse`); db_*: (K, N); returns
    (K,) with invalid keyframes at -1.  s = sum_w min(q_w, d_w) — computed
    as an equality-masked min matmul, one batched program for the whole
    database (ScoringObject.cc L1Scoring semantics)."""
    eq = (q_words[None, :, None] == db_words[:, None, :]) & (q_words >= 0)[None, :, None]
    pair_min = jnp.minimum(q_weights[None, :, None], db_weights[:, None, :])
    s = jnp.sum(jnp.where(eq, pair_min, 0.0), axis=(1, 2))
    return jnp.where(db_valid, s, -1.0)
