"""Bag-of-binary-words vocabulary: the DBoW2 equivalent.

Replaces the vendored ``Thirdparty/DBoW2`` (``TemplatedVocabulary.h``,
``FORB.cpp``): the k-ary vocabulary tree becomes flat arrays and word
lookup becomes a vectorized L-step descent (gather children descriptors,
batched Hamming argmin) over all frame descriptors at once. Loads the
reference's ``ORBvoc.txt`` format (``System::LoadVocabulary``,
``src/System.cc:86-96`` reads the same file), and can train a fresh
vocabulary with hierarchical binary k-medians for tests/new domains —
something the reference cannot do (it ships only the pretrained file).

Scoring: L1 (the DBoW2 default used by ORB-SLAM2):
``s(v, w) = 1 - 0.5 * |v/|v| - w/|w||_1`` over L1-normalized tf-idf vectors.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class Vocabulary:
    k: int  # branching factor
    L: int  # depth
    children: np.ndarray  # [n_nodes, k] int32 node ids (-1 = none)
    node_desc: np.ndarray  # [n_nodes, 8] uint32
    word_id: np.ndarray  # [n_nodes] int32 (-1 for non-leaves)
    weights: np.ndarray  # [n_words] float32 idf weights
    n_words: int

    def transform(self, descriptors: jnp.ndarray, valid: jnp.ndarray):
        """Descriptors [N, 8] -> (word ids [N], tf-idf weights [N])."""
        wid, w, _nodes = self.transform_with_nodes(descriptors, valid)
        return wid, w

    def transform_with_nodes(
        self, descriptors: jnp.ndarray, valid: jnp.ndarray, levels_up: int = 1
    ):
        """Descent that ALSO returns the tree node ``levels_up`` above the
        leaf — the DBoW2 direct index (``FeatureVector``; ORB-SLAM2 builds
        it with levelsup=4 on an L=6 tree, ``ORBVocabulary`` typedef).
        Returns (word ids [N], tf-idf weights [N], node ids [N])."""
        children = jnp.asarray(self.children)
        node_desc = jnp.asarray(self.node_desc)
        word_id = jnp.asarray(self.word_id)
        weights = jnp.asarray(self.weights)

        def ham(a, b):  # [N, 8] vs [N, k, 8]
            x = jnp.bitwise_xor(a[:, None, :], b)
            return jnp.sum(jax.lax.population_count(x), axis=-1)

        node = jnp.zeros(descriptors.shape[0], jnp.int32)
        direct = jnp.zeros(descriptors.shape[0], jnp.int32)
        stop_level = max(self.L - max(levels_up, 0), 0)
        for lvl in range(self.L):
            ch = children[node]  # [N, k]
            has = ch >= 0
            cd = node_desc[jnp.maximum(ch, 0)]  # [N, k, 8]
            d = jnp.where(has, ham(descriptors, cd), 1 << 20)
            best = jnp.argmin(d, axis=1).astype(jnp.int32)
            nxt = jnp.take_along_axis(ch, best[:, None], axis=1)[:, 0]
            node = jnp.where(nxt >= 0, nxt, node)
            if lvl + 1 == stop_level:
                direct = node
        wid = word_id[node]
        w = jnp.where((wid >= 0) & valid, weights[jnp.maximum(wid, 0)], 0.0)
        return (
            jnp.where(valid, wid, -1),
            w,
            jnp.where(valid, direct, -1),
        )

    def bow_vector(self, descriptors, valid) -> dict[int, float]:
        """Sparse L1-normalized tf-idf BoW vector (host dict)."""
        wid, w = self.transform(descriptors, valid)
        wid = np.asarray(wid)
        w = np.asarray(w)
        vec: dict[int, float] = {}
        for i, t in zip(wid, w):
            if i >= 0 and t > 0:
                vec[int(i)] = vec.get(int(i), 0.0) + float(t)
        norm = sum(abs(v) for v in vec.values()) or 1.0
        return {k_: v / norm for k_, v in vec.items()}


def score_l1(v1: dict[int, float], v2: dict[int, float]) -> float:
    """DBoW2 L1 score in [0, 1] (``ScoringObject.cpp`` L1Scoring)."""
    s = 0.0
    for k_, x in v1.items():
        y = v2.get(k_)
        if y is not None:
            s += abs(x) + abs(y) - abs(x - y)
    return 0.5 * s


def _unpack_bits(desc_u32: np.ndarray) -> np.ndarray:
    """[N, 8] uint32 -> [N, 256] uint8 bits."""
    b = desc_u32.astype(np.uint32)
    bits = ((b[:, :, None] >> np.arange(32, dtype=np.uint32)) & 1).astype(np.uint8)
    return bits.reshape(len(desc_u32), 256)


def _pack_bits(bits: np.ndarray) -> np.ndarray:
    w = bits.reshape(-1, 8, 32).astype(np.uint32)
    return (w << np.arange(32, dtype=np.uint32)).sum(axis=2).astype(np.uint32)


def build_vocabulary(
    descriptors: np.ndarray,  # [N, 8] uint32 training set
    k: int = 6,
    L: int = 3,
    seed: int = 0,
    iters: int = 4,
) -> Vocabulary:
    """Hierarchical binary k-medians (the DBoW2 training algorithm)."""
    rng = np.random.default_rng(seed)
    bits = _unpack_bits(descriptors)

    nodes_desc = [np.zeros(256, np.uint8)]  # root placeholder
    children: list[list[int]] = [[]]
    word_of: list[int] = [-1]
    leaf_counts: list[int] = []

    def cluster(idx: np.ndarray, depth: int, parent: int):
        nonlocal nodes_desc, children, word_of
        if depth == L or len(idx) <= 1:
            # leaf: parent becomes a word
            word_of[parent] = len(leaf_counts)
            leaf_counts.append(len(idx))
            return
        kk = min(k, len(idx))
        centers = bits[rng.choice(idx, kk, replace=False)].astype(np.float32)
        for _ in range(iters):
            d = np.abs(bits[idx][:, None, :] - centers[None]).sum(-1)
            assign = d.argmin(1)
            for c in range(kk):
                sel = idx[assign == c]
                if len(sel):
                    centers[c] = (bits[sel].mean(0) > 0.5).astype(np.float32)
        d = np.abs(bits[idx][:, None, :] - centers[None]).sum(-1)
        assign = d.argmin(1)
        for c in range(kk):
            sel = idx[assign == c]
            if len(sel) == 0:
                continue
            node_id = len(nodes_desc)
            nodes_desc.append((centers[c] > 0.5).astype(np.uint8))
            children.append([])
            word_of.append(-1)
            children[parent].append(node_id)
            cluster(sel, depth + 1, node_id)

    cluster(np.arange(len(bits)), 0, 0)

    n_nodes = len(nodes_desc)
    ch = np.full((n_nodes, k), -1, np.int32)
    for i, c in enumerate(children):
        ch[i, : len(c)] = c[:k]
    nd = _pack_bits(np.stack(nodes_desc))
    n_words = len(leaf_counts)
    # idf weights
    counts = np.maximum(np.array(leaf_counts, np.float32), 1.0)
    weights = np.log(len(bits) / counts)
    weights = np.maximum(weights, 1e-3)
    return Vocabulary(
        k=k, L=L, children=ch, node_desc=nd,
        word_id=np.array(word_of, np.int32), weights=weights.astype(np.float32),
        n_words=n_words,
    )


def save_orbvoc_text(voc: Vocabulary, path: str) -> None:
    """Write the DBoW2 text format (``TemplatedVocabulary::saveToTextFile``):
    header ``k L scoring weighting``; one line per non-root node in an order
    where every parent precedes its children (BFS): ``parent_id is_leaf
    b0..b31 weight``. Node ids in the file are implicit (1-based creation
    order), so the writer renumbers via the BFS traversal — a reloaded
    vocabulary assigns identical words for every descriptor (round-trip
    parity test)."""
    # BFS order with renumbering old-id -> file-id.
    order: list[int] = []
    fid = {0: 0}
    queue = [0]
    while queue:
        nid = queue.pop(0)
        for c in voc.children[nid]:
            if c >= 0:
                fid[int(c)] = len(order) + 1
                order.append(int(c))
                queue.append(int(c))
    with open(path, "w") as f:
        f.write(f"{voc.k} {voc.L} 0 0\n")
        for nid in order:
            par = -1
            # find parent (small vocabularies only; fine for tests/training)
            rows, cols = np.nonzero(voc.children == nid)
            par = int(rows[0]) if len(rows) else 0
            is_leaf = 1 if voc.word_id[nid] >= 0 else 0
            by = voc.node_desc[nid].astype("<u4").view(np.uint8)
            w = float(voc.weights[voc.word_id[nid]]) if is_leaf else 0.0
            f.write(
                f"{fid[par]} {is_leaf} "
                + " ".join(str(int(b)) for b in by)
                + f" {w}\n"
            )


def load_orbvoc_text(path: str) -> Vocabulary:
    """Load the DBoW2 text vocabulary format used by ORB-SLAM2's
    ``ORBvoc.txt``: header ``k L s1 s2``, then one node per line:
    ``parent_id is_leaf b0..b31 weight`` in creation order."""
    with open(path) as f:
        header = f.readline().split()
        k, L = int(header[0]), int(header[1])
        parents, leaves, descs, wts = [], [], [], []
        for line in f:
            p = line.split()
            if len(p) < 35:
                continue
            parents.append(int(p[0]))
            leaves.append(int(p[1]))
            descs.append([int(x) for x in p[2:34]])
            wts.append(float(p[34]))
    n = len(parents) + 1  # + root
    children = np.full((n, k), -1, np.int32)
    ccount = np.zeros(n, np.int32)
    node_bytes = np.zeros((n, 32), np.uint8)
    word_id = np.full(n, -1, np.int32)
    weights = []
    for i in range(len(parents)):
        nid = i + 1
        par = parents[i]
        children[par, ccount[par]] = nid
        ccount[par] += 1
        node_bytes[nid] = np.array(descs[i], np.uint8)
        if leaves[i]:
            word_id[nid] = len(weights)
            weights.append(wts[i])
    node_desc = node_bytes.view("<u4").reshape(n, 8)
    return Vocabulary(
        k=k, L=L, children=children, node_desc=node_desc,
        word_id=word_id, weights=np.array(weights, np.float32),
        n_words=len(weights),
    )


_DEFAULT_VOCAB_CACHE: "Vocabulary | None" = None


def default_vocabulary() -> "Vocabulary | None":
    """Load the packaged synthetic-ORB vocabulary artifact
    (``gsorb_slam_tpu/assets/ORBvoc_synth.txt``, trained by
    ``scripts/train_vocab.py``) — the role of the reference's
    ``Vocabulary/ORBvoc.txt`` loaded at System startup
    (``src/System.cc:86-96``). Returns None if the artifact is missing."""
    global _DEFAULT_VOCAB_CACHE
    if _DEFAULT_VOCAB_CACHE is not None:
        return _DEFAULT_VOCAB_CACHE
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "assets",
                        "ORBvoc_synth.txt")
    if not os.path.exists(path):
        return None
    _DEFAULT_VOCAB_CACHE = load_orbvoc_text(path)
    return _DEFAULT_VOCAB_CACHE
