"""Distributed spherical k-means over an embedding column, and the
SemDeDup-style semantic near-dup pass built on it (Abbas et al. 2023:
cluster embeddings, then look for near-duplicates only WITHIN clusters).

Scale shape per Lloyd round: centroids (k x dim, tiny) broadcast via
``ray.put``; every batch computes assignments with one matmul and emits
k-bounded partials (per-centroid count + vector sum) — the corpus never
shuffles, each round moves k x n_batches small rows to a driver-side
reduce (k-bounded, the canonical distributed-kmeans layout).  Rounds
re-read the input; pass a materialized/cached dataset when iterating
many rounds over a hot corpus.

Determinism: seeded hash-sample init (reuses the IVF sampler), argmax
assignment of a pure function of the broadcast centroids — results are
partitioning-invariant and reproducible.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from tokrle.functions.ann import _normalize, _to_matrix, hash_sample


def kmeans_fit(ds, *, k: int = 8, iters: int = 5,
               vec_col: str = "embedding", id_col: str = "vec_id",
               seed: int = 23, sample_size: int = 4096) -> np.ndarray:
    """Spherical k-means centroids (k x dim, unit rows) trained with
    ``iters`` full-corpus Lloyd rounds from a seeded hash-sample init."""
    import ray

    rows = hash_sample(ds, id_col, sample_size)[vec_col]
    sample = (np.stack([np.asarray(r, dtype=np.float64) for r in rows])
              if len(rows) else np.zeros((0, 0)))
    sample = _normalize(sample)
    rng = np.random.default_rng(seed)
    k = min(k, len(sample))
    centroids = sample[rng.choice(len(sample), size=k, replace=False)]

    for _ in range(iters):
        ref = ray.put(centroids)

        def partials(batch: pa.Table, *, _ref=ref) -> pa.Table:
            import ray as _ray

            c = _ray.get(_ref)
            m = _normalize(_to_matrix(batch.column(vec_col)))
            if len(m) == 0:
                return pa.table({
                    "cid": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "vsum": pa.array([], pa.large_list(pa.float64()))})
            assign = np.argmax(m @ c.T, axis=1)
            sums = np.zeros((len(c), m.shape[1]))
            np.add.at(sums, assign, m)
            counts = np.bincount(assign, minlength=len(c)).astype(np.int64)
            used = np.flatnonzero(counts)
            flat = sums[used].ravel()
            offs = np.arange(len(used) + 1, dtype=np.int64) * m.shape[1]
            return pa.table({
                "cid": pa.array(used.astype(np.int64), pa.int64()),
                "n": pa.array(counts[used], pa.int64()),
                "vsum": pa.LargeListArray.from_arrays(
                    pa.array(offs, pa.int64()),
                    pa.array(flat, pa.float64())),
            })

        # k-bounded driver reduce: k x n_batches tiny rows
        parts = ds.map_batches(partials, batch_format="pyarrow").to_pandas()
        new = centroids.copy()
        if len(parts):
            for cid, grp in parts.groupby("cid"):
                v = np.sum([np.asarray(x) for x in grp["vsum"]], axis=0)
                norm = np.linalg.norm(v)
                if norm > 0:
                    new[int(cid)] = v / norm
        centroids = new
    return centroids


def kmeans_assign(ds, centroids: np.ndarray, *,
                  vec_col: str = "embedding"):
    """Append ``cluster_id`` (nearest-centroid argmax) — a stateless
    broadcast map, partitioning-invariant."""
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def fn(batch: pa.Table) -> pa.Table:
        import ray as _ray

        c = _ray.get(ref)
        m = _normalize(_to_matrix(batch.column(vec_col)))
        assign = (np.argmax(m @ c.T, axis=1).astype(np.int64)
                  if len(m) else np.zeros(0, np.int64))
        return batch.append_column(
            "cluster_id", pa.array(assign, type=pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def semdedup_pairs(ds, centroids: np.ndarray, *, threshold: float = 0.99,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   max_cluster: int = 65536,
                   num_partitions: int | None = None):
    """Near-duplicate (id_a, id_b, sim) pairs found WITHIN k-means
    clusters (the SemDeDup blocking): assign -> hash-co-locate clusters
    -> per-cluster upper-triangle matmul.  Clusters larger than
    ``max_cluster`` are truncated with a warning (pathological single
    cluster = retrain with larger k)."""
    import logging

    from tokrle.functions.dedup import _group_blocks

    log = logging.getLogger(__name__)
    assigned = kmeans_assign(ds, centroids, vec_col=vec_col) \
        .select_columns([id_col, vec_col, "cluster_id"])
    grouped = _group_blocks(assigned, keys=["cluster_id"],
                            num_partitions=num_partitions)

    def block_pairs(batch: pa.Table) -> pa.Table:
        out_a, out_b, out_s = [], [], []
        if len(batch):
            cids = batch.column("cluster_id").to_numpy(zero_copy_only=False)
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            m = _normalize(_to_matrix(batch.column(vec_col)))
            codes, uniques = pd.factorize(cids)
            order = np.argsort(codes, kind="stable")
            c = codes[order]
            starts = np.flatnonzero(
                np.concatenate(([True], c[1:] != c[:-1])))
            ends = np.concatenate((starts[1:], [len(c)]))
            for s, e in zip(starts, ends):       # one matmul per cluster
                idx = order[s:e]
                if len(idx) > max_cluster:
                    log.warning("semdedup: cluster %s truncated %d -> %d",
                                uniques[c[s]], len(idx), max_cluster)
                    idx = idx[np.argsort(ids[idx])[:max_cluster]]
                if len(idx) < 2:
                    continue
                sims = m[idx] @ m[idx].T
                ai, bi = np.nonzero(np.triu(sims >= threshold, k=1))
                out_a.extend(ids[idx][ai].tolist())
                out_b.extend(ids[idx][bi].tolist())
                out_s.extend(sims[ai, bi].tolist())
        return pa.table({"id_a": pa.array(out_a, pa.int64()),
                         "id_b": pa.array(out_b, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    return grouped.map_batches(block_pairs, batch_size=None,
                               batch_format="pyarrow")
