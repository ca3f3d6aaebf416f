"""Product quantization (PQ): a lossy vector codec for embedding columns +
asymmetric-distance ANN over the codes (Jegou, Douze & Schmid 2011,
"Product Quantization for Nearest Neighbor Search").

This is the embedding-column counterpart of the integer codec layer: a
``list<float>`` column (d x 4 bytes/vector) compresses to ``m`` uint8 codes
per vector (16x at d=64, m=16) while remaining directly queryable — top-k
search runs on the CODES via per-query lookup tables, never decoding the
corpus.

Scale shape:

- **train** — codebooks are model-sized (m x k x d/m floats), trained
  driver-side on a bounded :func:`~tokrle.functions.ann.hash_sample`
  (the IVF-centroid precedent: the corpus itself never leaves the cluster,
  and the sample is spread across all blocks, not ``limit(n)``-biased).
- **encode** — codebooks broadcast once via ``ray.put``; each batch runs m
  small matmuls (one per subspace) and emits (id, codes) rows.  The
  encoded corpus is what you persist / query at 100 TB: 1/16th the bytes
  through every downstream scan.
- **query (ADC)** — per query an (m x k) table of subspace distances is
  built once (tiny), broadcast, and each batch scores all its vectors with
  m gather+add passes over the uint8 code matrix — no float vectors are
  read at query time.  Local per-batch top-k prunes before the single
  query-id exchange (reuses :func:`~tokrle.functions.ann._topk_reduce`, so
  the driver sees n_queries x k rows, never per-batch partials).

Determinism: seeded sample + seeded init, ``np.argmin`` lowest-index tie
break, lexsort (distance, vec_id) ordering — results are
partitioning-invariant and reproducible.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from tokrle.functions.ann import (_normalize, _to_matrix, _topk_reduce,
                                  hash_sample)


def _subspace_kmeans(x: np.ndarray, k: int, iters: int,
                     rng: np.random.Generator) -> np.ndarray:
    """Plain-L2 Lloyd on one subspace of the training sample (driver-side,
    sample-bounded).  Empty clusters keep their previous centroid; squared
    distances via the matmul identity, never an (n, k, dsub) tensor."""
    k = min(k, len(x))
    cent = x[rng.choice(len(x), size=k, replace=False)]
    for _ in range(iters):
        d = ((x * x).sum(1)[:, None] - 2.0 * (x @ cent.T)
             + (cent * cent).sum(1)[None, :])
        assign = np.argmin(d, axis=1)
        sums = np.zeros_like(cent)
        np.add.at(sums, assign, x)
        counts = np.bincount(assign, minlength=k)
        nz = counts > 0
        cent = cent.copy()
        cent[nz] = sums[nz] / counts[nz, None]
    return cent


def pq_train(ds, *, m: int = 16, k: int = 256, iters: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             seed: int = 31, sample_size: int = 4096) -> np.ndarray:
    """Train PQ codebooks: split each (normalized) vector into ``m``
    subspaces of d/m dims and run k-means per subspace on a bounded
    hash sample.  Returns codebooks of shape (m, k', d/m), k' <= k."""
    rows = hash_sample(ds, id_col, sample_size)[vec_col]
    sample = (np.stack([np.asarray(r, dtype=np.float64) for r in rows])
              if len(rows) else np.zeros((0, 0)))
    sample = _normalize(sample)
    n, d = sample.shape
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    if k > 256:
        raise ValueError("k > 256 does not fit uint8 codes")
    dsub = d // m
    rng = np.random.default_rng(seed)
    kk = min(k, n)
    books = np.empty((m, kk, dsub), dtype=np.float64)
    for j in range(m):
        books[j] = _subspace_kmeans(
            np.ascontiguousarray(sample[:, j * dsub:(j + 1) * dsub]),
            kk, iters, rng)
    return books


def _encode_matrix(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) normalized vectors -> (n, m) uint8 codes: per subspace one
    squared-distance matmul + lowest-index argmin."""
    m, k, dsub = books.shape
    codes = np.empty((len(mat), m), dtype=np.uint8)
    for j in range(m):
        x = mat[:, j * dsub:(j + 1) * dsub]
        c = books[j]
        d = ((x * x).sum(1)[:, None] - 2.0 * (x @ c.T)
             + (c * c).sum(1)[None, :])
        codes[:, j] = np.argmin(d, axis=1)
    return codes


def pq_decode_codes(codes: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) codes -> (n, d) reconstructed vectors (centroid gather)."""
    m, k, dsub = books.shape
    out = np.empty((len(codes), m * dsub), dtype=np.float64)
    for j in range(m):
        out[:, j * dsub:(j + 1) * dsub] = books[j][codes[:, j]]
    return out


def _codes_list_array(codes: np.ndarray) -> pa.LargeListArray:
    n, m = codes.shape
    offsets = pa.array(np.arange(0, (n + 1) * m, m, dtype=np.int64),
                       type=pa.int64())
    return pa.LargeListArray.from_arrays(
        offsets, pa.array(codes.ravel(), type=pa.uint8()))


def pq_encode(ds, books: np.ndarray, *, vec_col: str = "embedding",
              id_col: str = "vec_id"):
    """Encode the embedding column to PQ codes: (id, codes list<uint8>)
    rows, m bytes per vector.  Codebooks broadcast once via ``ray.put``."""
    import ray

    ref = ray.put(books)

    def fn(batch: pa.Table) -> pa.Table:
        cb = ray.get(ref)
        mat = _normalize(_to_matrix(batch.column(vec_col)))
        ids = batch.column(id_col)
        if len(mat) == 0:
            return pa.table({id_col: pa.array([], ids.type),
                             "codes": pa.array([], pa.large_list(pa.uint8()))})
        codes = _encode_matrix(mat, cb)
        return pa.table({id_col: ids, "codes": _codes_list_array(codes)})

    return ds.map_batches(fn, batch_format="pyarrow")


def _codes_matrix(col, m: int) -> np.ndarray:
    la = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = la.flatten()
    flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
    return flat.to_numpy(zero_copy_only=False).reshape(-1, m)


def pq_topk(code_ds, queries: np.ndarray, query_ids: np.ndarray,
            books: np.ndarray, k: int = 10, *, id_col: str = "vec_id",
            exclude_self: bool = True) -> pd.DataFrame:
    """Asymmetric-distance top-k over PQ codes: per query an (m x k') table
    of subspace squared distances, per batch m gather+add passes over the
    uint8 code matrix — the corpus is scored without decoding a single
    vector.  Returns (q_id, vec_id, rank), smaller distance = better,
    ties by smaller vec_id."""
    import ray

    m, kc, dsub = books.shape
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    tables = np.empty((len(qn), m, kc), dtype=np.float64)
    for j in range(m):
        q = qn[:, j * dsub:(j + 1) * dsub]
        c = books[j]
        tables[:, j, :] = ((q * q).sum(1)[:, None] - 2.0 * (q @ c.T)
                           + (c * c).sum(1)[None, :])
    ref = ray.put((tables, np.asarray(query_ids)))

    def per_batch(batch: pa.Table) -> pa.Table:
        tabs, q_ids = ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({"q_id": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "sim": pa.array([], type=pa.float64())})
        codes = _codes_matrix(batch.column("codes"), tabs.shape[1])
        dist = np.zeros((len(tabs), len(ids)), dtype=np.float64)
        for j in range(tabs.shape[1]):
            dist += tabs[:, j, :][:, codes[:, j]]
        kk = min(k + (1 if exclude_self else 0), dist.shape[1])
        out_q, out_v, out_s = [], [], []
        for qi in range(dist.shape[0]):
            order = np.lexsort((ids, dist[qi]))[:kk]
            out_q.extend([int(q_ids[qi])] * len(order))
            out_v.extend(ids[order].tolist())
            out_s.extend((-dist[qi][order]).tolist())  # sim: larger = better
        return pa.table({"q_id": pa.array(out_q, type=pa.int64()),
                         "vec_id": pa.array(out_v, type=pa.int64()),
                         "sim": pa.array(out_s, type=pa.float64())})

    partial = code_ds.map_batches(per_batch, batch_format="pyarrow")
    return _topk_reduce(partial, k, exclude_self=exclude_self)


def pq_ann(ds, queries: np.ndarray, query_ids: np.ndarray, *,
           k: int = 10, m: int = 16, n_centroids: int = 256,
           vec_col: str = "embedding", id_col: str = "vec_id",
           seed: int = 31, exclude_self: bool = True):
    """One-shot convenience: train -> encode -> ADC query.  Returns
    (result DataFrame, codebooks, encoded Dataset)."""
    books = pq_train(ds, m=m, k=n_centroids, vec_col=vec_col,
                     id_col=id_col, seed=seed)
    code_ds = pq_encode(ds, books, vec_col=vec_col, id_col=id_col)
    res = pq_topk(code_ds, queries, query_ids, books, k=k,
                  id_col=id_col, exclude_self=exclude_self)
    return res, books, code_ds


def pq_rerank_topk(ds, code_ds, queries: np.ndarray, query_ids: np.ndarray,
                   books: np.ndarray, *, k: int = 1, rerank: int = 64,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   exclude_self: bool = True) -> pd.DataFrame:
    """ADC + exact-rerank (the IVFADC+R architecture, Jegou et al. 2011
    §VI): asymmetric-distance top-``rerank`` candidates per query over the
    uint8 codes, then exact cosine over ONLY the candidate union — a
    pruned, id-filtered read of ``<= n_queries * rerank`` true vectors,
    never the corpus.  With the candidate set containing each query's
    true neighbours (holds with large margin on this corpus: containment
    verified at rerank=16 across sf0.001/0.01/0.1), the top-k equals
    exact brute force — which is the SQL-expressible self-oracle."""
    import pyarrow.compute as pc

    approx = pq_topk(code_ds, queries, query_ids, books, k=rerank,
                     id_col=id_col, exclude_self=exclude_self)
    cand_ids = pa.array(sorted(set(approx["vec_id"].tolist())
                               | set(int(q) for q in query_ids)))
    cand = ds.map_batches(
        lambda t, ids=cand_ids: t.filter(
            pc.is_in(t.column(id_col), value_set=ids)),
        batch_format="pyarrow")
    from tokrle.functions.ann import brute_force_topk

    return brute_force_topk(cand, queries, query_ids, k=k,
                            vec_col=vec_col, id_col=id_col,
                            exclude_self=exclude_self)
