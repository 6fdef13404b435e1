"""Deterministic synthetic corpora for benchmarks and tests.

The driver's ``embeddings`` table is near-uniform random (intra-label mean
cosine ~0.0008 — see ``operators/similarity.py``), which is the WORST case
for IVF pruning: recall requires scanning most of the corpus, so IVF's win
over one flat scan caps at ~1.25x there (measured, SCALING.md).  Real
embedding corpora are clustered — semantically similar documents form
tight cones — and that is the regime where inverted-list pruning pays.
This module builds that regime deterministically so the claim can be
MEASURED instead of argued.

Everything is hash-seeded (md5 over structured keys), RNG-free like the
rest of the repo: the same (n, dim, clusters, noise) always yields the
same bytes, on any machine, with no random state to carry.
"""

from __future__ import annotations

import hashlib

MIX_DIM = 64
MIX_CLUSTERS = 50
MIX_NOISE = 0.4


def _hash_unit(key: str, count: int) -> list[float]:
    """``count`` deterministic values in [-1, 1) from md5(key:block):
    each digest yields four 32-bit chunks, so one md5 covers 4 values."""
    vals: list[float] = []
    for block in range((count + 3) // 4):
        digest = hashlib.md5(f"{key}:{block}".encode()).hexdigest()
        for j in range(4):
            h = int(digest[j * 8 : (j + 1) * 8], 16)
            vals.append(h / 2147483648.0 - 1.0)
    return vals[:count]


def clustered_embedding_rows(
    n: int,
    dim: int = MIX_DIM,
    clusters: int = MIX_CLUSTERS,
    noise: float = MIX_NOISE,
    id_offset: int = 0,
    cent_seed: str = "mixcent",
) -> list[tuple[int, int, list[float]]]:
    """(vec_id, label, embedding) rows drawn from a hash-seeded mixture.

    Cluster c's centroid is uniform [-1,1)^dim (norm ~ sqrt(dim/3));
    vector i = centroid[i % clusters] + noise * uniform[-1,1)^dim.  At the
    default noise=0.4 the expected intra-cluster cosine is
    (dim/3) / (dim/3 + dim*noise^2/3) ~ 0.86 and inter-cluster ~ 0 — the
    "tight cones" shape of a real embedding corpus.  ``label`` IS the
    mixture component, so the two-level IVF codebook's coarse level
    aligns with the true structure (exactly what a trained coarse
    quantizer converges to on clustered data).

    The mixture component is HASHED from the relative index, not
    ``i % clusters``: the ANN operators' query set is a vec_id stride
    (``similarity.QUERY_STRIDE`` = 100), and any modular assignment whose
    cluster count shares a factor with the stride concentrates every
    query in a few components (50 | 100 put ALL of them in component 0 —
    an r6 review catch), silently narrowing recall/speedup measurements
    to one cluster.  Hashing decorrelates component from any id stride,
    so strided query sets cover all components.

    ``id_offset`` shifts vec_ids for replica corpora; the mixture
    component of a vector depends only on the relative index
    (vec_id - id_offset) while its noise depends on the absolute vec_id,
    so replicas share the SAME cluster geometry with fresh members (a
    bigger corpus of the same distribution, not duplicated points).
    """
    # ``cent_seed`` gives a composed fixture its OWN centroid space: a
    # blob file built with clusters=1 otherwise sits exactly ON the
    # background's cluster-0 centroid (both hash "mixcent:0"), quietly
    # entangling the two populations (r11 dedup-first fixture catch).
    cents = [
        _hash_unit(f"{cent_seed}:{c}", dim) for c in range(clusters)
    ]
    rows = []
    for i in range(n):
        vid = id_offset + i
        c = int(hashlib.md5(f"mixcomp:{i}".encode()).hexdigest()[:8], 16) % clusters
        nz = _hash_unit(f"mixnoise:{vid}", dim)
        emb = [cents[c][d] + noise * nz[d] for d in range(dim)]
        rows.append((vid, c, emb))
    return rows


def write_clustered_embeddings(
    path: str,
    n: int,
    dim: int = MIX_DIM,
    clusters: int = MIX_CLUSTERS,
    noise: float = MIX_NOISE,
    id_offset: int = 0,
    cent_seed: str = "mixcent",
) -> None:
    """Write the mixture corpus as parquet with the driver ``embeddings``
    schema (vec_id long, label long, embedding list<float>).  With
    ``id_offset`` the file composes with others into one directory-read
    corpus (disjoint vec_id ranges — the blob-on-background fixtures)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = clustered_embedding_rows(n, dim, clusters, noise, id_offset, cent_seed)
    table = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "label": pa.array([r[1] for r in rows], pa.int64()),
            "embedding": pa.array(
                [[float(x) for x in r[2]] for r in rows],
                pa.list_(pa.float32()),
            ),
        }
    )
    pq.write_table(table, path)
