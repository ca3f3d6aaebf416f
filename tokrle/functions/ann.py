"""Similarity search over an embedding column.

Brute-force cosine top-k: the query matrix is broadcast once via
``ray.put`` and read inside every map_batches task (never re-shipped per
batch); each batch computes a numpy matmul and emits only its local top-k,
so the driver-side final reduce sees num_batches * k rows, not the corpus.

LSH-bucketed variant: random-hyperplane signatures put candidate vectors
into buckets; only the query's bucket (and Hamming-adjacent buckets) are
scanned — the scale path when the corpus no longer fits a full scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from tokrle.functions.dedup import auto_concurrency as _auto


def _to_matrix(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, (pa.ListArray, pa.LargeListArray, pa.FixedSizeListArray)):
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(arr)
        return flat.reshape(n, -1) if n else flat.reshape(0, 0)
    # Ray tensor extension array (from_pandas of ndarray column) or similar
    m = np.asarray(arr.to_numpy(zero_copy_only=False))
    if m.dtype == object:
        m = np.stack(m) if len(m) else m.reshape(0, 0)
    return m.astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def brute_force_topk(ds, queries: np.ndarray, query_ids: np.ndarray,
                     k: int = 10, *, vec_col: str = "embedding",
                     id_col: str = "vec_id", exclude_self: bool = True):
    """Top-k cosine neighbours for each query vector.

    Returns a pandas DataFrame (q_id, vec_id, rank) — ints only, so
    differential oracles are immune to float formatting.  Ties broken by
    smaller vec_id (deterministic).
    """
    import ray

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put((qn, np.asarray(query_ids)))

    def per_batch(batch: pa.Table) -> pa.Table:
        q_mat, q_ids = ray.get(q_ref)
        m = _normalize(_to_matrix(batch.column(vec_col)))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({"q_id": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "sim": pa.array([], type=pa.float64())})
        sims = q_mat @ m.T  # (n_q, n_batch)
        kk = min(k + (1 if exclude_self else 0), sims.shape[1])
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[0]):
            # deterministic: sort by (-sim, vec_id)
            order = np.lexsort((ids, -sims[qi]))[:kk]
            out_q.extend([int(q_ids[qi])] * len(order))
            out_v.extend(ids[order].tolist())
            out_s.extend(sims[qi][order].tolist())
        return pa.table({"q_id": pa.array(out_q, type=pa.int64()),
                         "vec_id": pa.array(out_v, type=pa.int64()),
                         "sim": pa.array(out_s, type=pa.float64())})

    partial = ds.map_batches(per_batch, batch_format="pyarrow")
    return _topk_reduce(partial, k, exclude_self=exclude_self)


def _topk_reduce(partial_ds, k: int, *, exclude_self: bool = True
                 ) -> pd.DataFrame:
    """Distributed final top-k: per-batch candidate partials are grouped by
    query id and reduced INSIDE the cluster (one small group per query),
    so the driver only ever receives n_queries * k result rows — never the
    num_batches * k partial set (unbounded at corpus scale)."""

    def reduce_q(g: pd.DataFrame) -> pd.DataFrame:
        qid = g["q_id"].iloc[0]
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True],
                          kind="mergesort")
        if exclude_self:
            g = g[g["vec_id"] != qid]
        g = g.head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1)
        return g[["q_id", "vec_id", "rank"]]

    out = partial_ds.groupby("q_id").map_groups(
        reduce_q, batch_format="pandas").to_pandas()
    if out.empty:
        return pd.DataFrame(columns=["q_id", "vec_id", "rank"])
    return out.reset_index(drop=True)


class HyperplaneLSH:
    """Stateful LSH signature stage: hyperplanes sampled once per actor
    from a fixed seed; signature = sign-bit pattern of projections."""

    def __init__(self, dim: int, n_planes: int = 16, seed: int = 7) -> None:
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_planes, dim))

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch.column("embedding"))
        sig = _signatures(m, self.planes)  # ONE signature convention
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "bucket": pa.array(sig, type=pa.int64()),
        })


def lsh_bucket_index(ds, dim: int, n_planes: int = 16, concurrency=None):
    """Build the bucketed index Dataset (vec_id, bucket) — write_parquet it
    partitioned by bucket for the scale path."""
    return ds.map_batches(HyperplaneLSH, batch_size=4096,
                          fn_constructor_kwargs={"dim": dim,
                                                 "n_planes": n_planes},
                          batch_format="pyarrow",
                          concurrency=concurrency or _auto())


def hash_sample(ds, id_col: str, n: int):
    """Deterministic ~n-row sample spread across ALL blocks: keep rows
    whose mixed id hash falls under n/count (a streaming filter, no
    shuffle), then cap at n.  Unlike ``ds.limit(n)`` — which takes the
    FIRST blocks and biases any training done on the sample — the hash
    spreads the sample uniformly over the dataset."""
    total = ds.count()
    if total <= n:
        return ds.to_pandas()
    # threshold on a 64-bit hash: keep ~1.5x n, cap at n after collect.
    # When 1.5x n covers the whole dataset (n < total <= 1.5n) the
    # filter is a no-op — skip it (a frac-1.0 threshold would need
    # 2^64, which uint64 cannot hold)
    frac = 1.5 * n / total
    if frac >= 1.0:
        out = ds.to_pandas()
        return out.sort_values(id_col, kind="mergesort").head(n)
    thresh = np.uint64(int(frac * (1 << 63)) * 2)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        h = (ids + np.uint64(0x9E3779B97F4A7C15))
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
        mask = h < thresh
        return batch.filter(pa.array(mask))

    out = ds.map_batches(keep, batch_format="pyarrow").to_pandas()
    return out.sort_values(id_col, kind="mergesort").head(n)


def lsh_build_index(ds, index_dir: str, *, n_planes: int = 8, seed: int = 7,
                    axis_planes: bool = False,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    concurrency=None) -> None:
    """Build a persistent bucket-partitioned LSH index: hyperplane matrix at
    ``index_dir/planes.npy`` (tiny, read by every query) and candidate
    vectors at ``index_dir/data/bucket=<b>/*.parquet`` — hive-partitioned
    Parquet, so queries prune at the READ and only probed buckets' bytes
    ever leave storage (the scale path: the full corpus is never scanned
    per query set).

    ``axis_planes=True`` uses the first ``n_planes`` standard basis
    vectors as hyperplanes (bucket = sign bits of the leading
    coordinates) instead of seeded Gaussian planes.  For isotropic
    embeddings the two are equivalent LSH families (a random rotation
    apart); the axis family's buckets are exactly reproducible by a SQL
    oracle (``sign(embedding[i])``), which makes the whole
    build->partition->probe->prune pipeline hash-verifiable end to end."""
    import os

    import ray.data  # noqa: F401  (ds already is a Dataset)

    first = ds.take_batch(1, batch_format="pyarrow")
    dim = len(first[vec_col][0])
    if axis_planes:
        if n_planes > dim:
            raise ValueError(
                f"axis_planes needs n_planes <= embedding dim "
                f"({n_planes} > {dim}): np.eye would pad all-zero "
                f"hyperplanes whose bucket bits are constant")
        planes = np.eye(n_planes, dim)
    else:
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((n_planes, dim))
    os.makedirs(index_dir, exist_ok=True)
    np.save(os.path.join(index_dir, "planes.npy"), planes)

    def sign(batch: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(batch.column(vec_col)))
        sig = _signatures(m, planes)
        return pa.table({
            id_col: batch.column(id_col),
            vec_col: batch.column(vec_col),
            "bucket": pa.array(sig, type=pa.int64()),
        })

    ds.map_batches(sign, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "data"), partition_cols=["bucket"])


def _signatures(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    if len(m) == 0:
        return np.zeros(0, dtype=np.int64)
    proj = m @ planes.T > 0
    sig = np.zeros(len(m), dtype=np.int64)
    for b in range(planes.shape[0]):
        sig |= proj[:, b].astype(np.int64) << b
    return sig


def lsh_probed_buckets(qsig: np.ndarray, n_planes: int,
                       radius: int = 1) -> set[int]:
    """Bucket ids within Hamming distance ``radius`` of any query signature
    (radius 0 = exact bucket; 1 = plus every single-bit flip)."""
    probed = set(int(s) for s in qsig)
    if radius >= 1:
        for s in qsig:
            for b in range(n_planes):
                probed.add(int(s) ^ (1 << b))
    return probed


def _partition_paths(data_dir: str, col: str, values) -> list[str]:
    """Parquet files under the hive partitions for the given key values —
    the explicit pruned-read path list handed to read_parquet (file paths,
    since Ray's read_parquet wants files when given a list)."""
    import glob
    import os

    paths = []
    for v in sorted(values):
        p = os.path.join(data_dir, f"{col}={v}")
        if os.path.isdir(p):
            paths.extend(sorted(glob.glob(os.path.join(p, "*.parquet"))))
    return paths


def lsh_query_index(index_dir: str, queries: np.ndarray,
                    query_ids: np.ndarray, k: int = 10, *, radius: int = 1,
                    vec_col: str = "embedding", id_col: str = "vec_id"):
    """Approximate top-k against a :func:`lsh_build_index` index.

    Reads ONLY the probed bucket partitions (query signatures + their
    Hamming-``radius`` neighbours) — a pruned ``read_parquet`` over the
    partition directories, never a full-corpus scan.  Queries that find no
    candidate besides themselves fall back to a full scan for just those
    queries (rare by construction; keeps exactly-k output rows)."""
    import os

    import ray.data

    planes = np.load(os.path.join(index_dir, "planes.npy"))
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    qsig = _signatures(qn, planes)
    probed = lsh_probed_buckets(qsig, planes.shape[0], radius)
    paths = _partition_paths(os.path.join(index_dir, "data"), "bucket",
                             probed)
    if not paths:
        return pd.DataFrame(columns=["q_id", "vec_id", "rank"])
    cand = ray.data.read_parquet(paths, columns=[id_col, vec_col])
    out = brute_force_topk(cand, qn, query_ids, k,
                           vec_col=vec_col, id_col=id_col)
    # fall back for any query with FEWER than k candidates (not just
    # zero): a sparsely-populated probed bucket must not silently
    # truncate recall below the documented exactly-k contract
    missing = [q for q in np.asarray(query_ids)
               if (out["q_id"] == q).sum() < k]
    if missing:
        out = out[~out["q_id"].isin(missing)]
        full = ray.data.read_parquet(os.path.join(index_dir, "data"),
                                     columns=[id_col, vec_col])
        sel = np.isin(np.asarray(query_ids), missing)
        fb = brute_force_topk(full, qn[sel],
                              np.asarray(query_ids)[sel], k,
                              vec_col=vec_col, id_col=id_col)
        out = pd.concat([out, fb], ignore_index=True)
    return out.sort_values(["q_id", "rank"]).reset_index(drop=True)


def ivf_build_index(ds, index_dir: str, *, n_lists: int = 16,
                    sample_size: int = 2048, seed: int = 23,
                    medoid_ids: list[int] | None = None,
                    vec_col: str = "embedding", id_col: str = "vec_id") -> None:
    """Build a persistent IVF index: centroids at ``index_dir/centroids.npy``
    (trained on a bounded driver-side sample) and vectors list-partitioned
    at ``index_dir/data/list_id=<l>/*.parquet`` so queries read only the
    ``nprobe`` nearest lists.

    ``medoid_ids`` pins the centroids to the (normalized) embeddings of
    those ids, in order, instead of running k-means on a sample — the
    k-medoid-seed variant.  Centroids are then rows of the table itself,
    so a SQL oracle can reproduce assignment, probing and the pruned
    candidate set exactly; the partition/prune machinery exercised is
    identical."""
    import os

    if medoid_ids is not None:
        import pyarrow.compute as pc

        want = list(medoid_ids)
        mdf = ds.map_batches(
            lambda t, w=want: t.filter(pc.is_in(
                t.column(id_col), value_set=pa.array(w))),
            batch_format="pyarrow").to_pandas() \
            .set_index(id_col).loc[want]
        index = IVFIndex.__new__(IVFIndex)
        index.centroids = _normalize(np.stack(
            mdf[vec_col].map(np.asarray).to_list()).astype(np.float64))
    else:
        sample_df = hash_sample(ds, id_col, sample_size)
        sample = np.stack(sample_df[vec_col].map(np.asarray).to_list())
        index = IVFIndex(sample, n_lists=n_lists, seed=seed)
    os.makedirs(index_dir, exist_ok=True)
    np.save(os.path.join(index_dir, "centroids.npy"), index.centroids)
    assigned = ds.map_batches(index.assign_stage(), batch_format="pyarrow")
    assigned.write_parquet(os.path.join(index_dir, "data"),
                           partition_cols=["list_id"])


def ivf_query_index(index_dir: str, queries: np.ndarray,
                    query_ids: np.ndarray, k: int = 10, *, nprobe: int = 4,
                    vec_col: str = "embedding", id_col: str = "vec_id"):
    """Approximate top-k against a :func:`ivf_build_index` index: probe the
    ``nprobe`` centroid-nearest lists per query, pruned-read only those
    partitions, exact cosine within."""
    import os

    import ray.data

    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    # stable: ties probe the lower list id, matching the SQL oracle's
    # (similarity DESC, list_id ASC) ordering
    probe = np.argsort(-(qn @ centroids.T), axis=1,
                       kind="stable")[:, :nprobe]
    lists = set(int(v) for v in probe.ravel())
    paths = _partition_paths(os.path.join(index_dir, "data"), "list_id",
                             lists)
    if not paths:
        return pd.DataFrame(columns=["q_id", "vec_id", "rank"])
    cand = ray.data.read_parquet(paths, columns=[id_col, vec_col])
    out = brute_force_topk(cand, qn, query_ids, k,
                           vec_col=vec_col, id_col=id_col)
    return out.sort_values(["q_id", "rank"]).reset_index(drop=True)


def lsh_topk(ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
             *, n_planes: int = 8, seed: int = 7, vec_col: str = "embedding",
             id_col: str = "vec_id"):
    """Approximate top-k: scan only candidate vectors whose LSH bucket
    matches a query's bucket in >= 1 plane-sign (Hamming-adjacent probing
    via per-plane bucket keys) — the scale path when a full scan is too
    expensive.  Recall < 1.0 by construction; the bench reports recall
    against brute_force_topk."""
    import pandas as pd
    import ray

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    rng = np.random.default_rng(seed)
    dim = qn.shape[1]
    planes = rng.standard_normal((n_planes, dim))
    qsig = (qn @ planes.T > 0)
    q_ref = ray.put((qn, np.asarray(query_ids), planes, qsig))

    def per_batch(batch: pa.Table) -> pa.Table:
        q_mat, q_ids, pl, qs = ray.get(q_ref)
        m = _normalize(_to_matrix(batch.column(vec_col)))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({"q_id": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "sim": pa.array([], type=pa.float64())})
        csig = m @ pl.T > 0
        out_q, out_v, out_s = [], [], []
        for qi in range(q_mat.shape[0]):
            # candidates: vectors agreeing with the query on >= n-1 planes
            agree = (csig == qs[qi]).sum(axis=1)
            cand = np.flatnonzero(agree >= pl.shape[0] - 1)
            if len(cand) == 0:
                continue
            sims = m[cand] @ q_mat[qi]
            kk = min(k + 1, len(cand))
            order = np.lexsort((ids[cand], -sims))[:kk]
            out_q.extend([int(q_ids[qi])] * kk)
            out_v.extend(ids[cand][order].tolist())
            out_s.extend(sims[order].tolist())
        return pa.table({"q_id": pa.array(out_q, type=pa.int64()),
                         "vec_id": pa.array(out_v, type=pa.int64()),
                         "sim": pa.array(out_s, type=pa.float64())})

    partial = ds.map_batches(per_batch, batch_format="pyarrow")
    return _topk_reduce(partial, k)


class IVFIndex:
    """IVF (inverted-file) ANN: deterministic kmeans-lite centroids trained
    once per actor from a seeded sample; assignment = nearest centroid.

    Scale path: `build`: one pass assigns every vector to a list (groupby
    centroid -> write partitioned parquet); `query`: scan only the nprobe
    nearest lists.  Brute-force within probed lists stays a numpy matmul.
    """

    def __init__(self, sample: np.ndarray, n_lists: int = 16,
                 iters: int = 8, seed: int = 23) -> None:
        rng = np.random.default_rng(seed)
        sample = _normalize(np.asarray(sample, dtype=np.float64))
        k = min(n_lists, len(sample))
        centroids = sample[rng.choice(len(sample), size=k, replace=False)]
        for _ in range(iters):  # spherical kmeans on the sample
            assign = np.argmax(sample @ centroids.T, axis=1)
            for c in range(k):
                m = sample[assign == c]
                if len(m):
                    v = m.sum(axis=0)
                    n = np.linalg.norm(v)
                    if n > 0:
                        centroids[c] = v / n
        self.centroids = centroids

    def assign_stage(self):
        centroids = self.centroids

        def fn(batch: pa.Table) -> pa.Table:
            m = _normalize(_to_matrix(batch.column("embedding")))
            lists = (np.argmax(m @ centroids.T, axis=1)
                     if len(m) else np.zeros(0, dtype=np.int64))
            return pa.table({
                "vec_id": batch.column("vec_id"),
                "list_id": pa.array(lists.astype(np.int64), type=pa.int64()),
                "embedding": batch.column("embedding"),
            })

        return fn


def ivf_topk(ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
             *, n_lists: int = 16, nprobe: int = 4, sample_size: int = 2048,
             seed: int = 23):
    """IVF approximate top-k: train centroids on a driver-side sample
    (bounded), assign + filter to the nprobe closest lists per query, exact
    cosine within probed lists."""
    import pandas as pd
    import ray

    sample_df = hash_sample(ds, "vec_id", sample_size)
    sample = np.stack(sample_df["embedding"].map(np.asarray).to_list())
    index = IVFIndex(sample, n_lists=n_lists, seed=seed)
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(qn @ index.centroids.T), axis=1)[:, :nprobe]
    q_ref = ray.put((qn, np.asarray(query_ids), probe))
    assigned = ds.map_batches(index.assign_stage(), batch_format="pyarrow")

    def per_batch(batch: pa.Table) -> pa.Table:
        q_mat, q_ids, probe_lists = ray.get(q_ref)
        m = _normalize(_to_matrix(batch.column("embedding")))
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        lists = batch.column("list_id").to_numpy(zero_copy_only=False)
        out_q, out_v, out_s = [], [], []
        for qi in range(q_mat.shape[0]):
            cand = np.flatnonzero(np.isin(lists, probe_lists[qi]))
            if len(cand) == 0:
                continue
            sims = m[cand] @ q_mat[qi]
            kk = min(k + 1, len(cand))
            order = np.lexsort((ids[cand], -sims))[:kk]
            out_q.extend([int(q_ids[qi])] * kk)
            out_v.extend(ids[cand][order].tolist())
            out_s.extend(sims[order].tolist())
        return pa.table({"q_id": pa.array(out_q, type=pa.int64()),
                         "vec_id": pa.array(out_v, type=pa.int64()),
                         "sim": pa.array(out_s, type=pa.float64())})

    partial = assigned.map_batches(per_batch, batch_format="pyarrow")
    return _topk_reduce(partial, k)
