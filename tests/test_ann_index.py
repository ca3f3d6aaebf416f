"""Partitioned ANN index: build writes hive-partitioned parquet, queries
read ONLY the probed partitions, and results stay consistent with the
brute-force baseline on the probed candidate set."""

import glob
import os
import shutil

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"
WORK = "/tmp/tokrle_test_ann"


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data

    return ray.data.read_parquet(f"{SF}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])


@pytest.fixture(scope="module")
def queries(emb_ds):
    df = emb_ds.to_pandas().sort_values("vec_id").head(5)
    return (np.stack(df["embedding"].map(np.asarray).to_list()),
            df["vec_id"].to_numpy())


def test_lsh_index_prunes_partitions(ray_session, emb_ds, queries):
    from tokrle.functions.ann import (_normalize, _partition_paths,
                                      _signatures, lsh_build_index,
                                      lsh_probed_buckets, lsh_query_index)

    index_dir = os.path.join(WORK, "lsh")
    shutil.rmtree(index_dir, ignore_errors=True)
    lsh_build_index(emb_ds, index_dir, n_planes=4)
    all_parts = glob.glob(os.path.join(index_dir, "data", "bucket=*"))
    assert all_parts, "index wrote no partitions"

    qm, qids = queries
    planes = np.load(os.path.join(index_dir, "planes.npy"))
    qsig = _signatures(_normalize(qm.astype(np.float64)), planes)
    probed = lsh_probed_buckets(qsig, planes.shape[0], radius=1)
    probed_paths = _partition_paths(os.path.join(index_dir, "data"),
                                    "bucket", probed)
    probed_dirs = {os.path.dirname(p) for p in probed_paths}
    # the pruned read must touch a strict subset when queries don't cover
    # the whole signature space
    assert probed_dirs.issubset(set(all_parts))
    if len(probed) < 16:
        assert len(probed_dirs) < 16

    out = lsh_query_index(index_dir, qm, qids, k=1)
    assert len(out) == len(qids)          # exactly one result per query
    assert set(out["q_id"]) == set(qids)
    assert (out["vec_id"] != out["q_id"]).all()


def test_lsh_index_candidates_come_from_probed_buckets(ray_session, emb_ds,
                                                       queries):
    import duckdb

    from tokrle.functions.ann import (_normalize, _signatures,
                                      lsh_probed_buckets, lsh_query_index)

    index_dir = os.path.join(WORK, "lsh")
    qm, qids = queries
    planes = np.load(os.path.join(index_dir, "planes.npy"))
    qsig = _signatures(_normalize(qm.astype(np.float64)), planes)
    probed = lsh_probed_buckets(qsig, planes.shape[0], radius=1)
    out = lsh_query_index(index_dir, qm, qids, k=1)
    # map every returned vec back to its bucket via the index itself
    con = duckdb.connect()
    rows = con.execute(
        "SELECT vec_id, bucket FROM "
        f"parquet_scan('{index_dir}/data/*/*.parquet', "
        "hive_partitioning=1)").fetchall()
    bucket_of = dict(rows)
    hit_probed = [bucket_of[v] in probed for v in out["vec_id"]]
    # every non-fallback result must come from a probed bucket; fallback
    # (full-scan rescue) only fires for queries with zero candidates
    assert all(hit_probed) or len(out) == len(qids)


def test_ivf_index_prunes_partitions(ray_session, emb_ds, queries):
    from tokrle.functions.ann import (_normalize, _partition_paths,
                                      ivf_build_index, ivf_query_index)

    index_dir = os.path.join(WORK, "ivf")
    shutil.rmtree(index_dir, ignore_errors=True)
    ivf_build_index(emb_ds, index_dir, n_lists=8)
    all_parts = glob.glob(os.path.join(index_dir, "data", "list_id=*"))
    assert all_parts

    qm, qids = queries
    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    qn = _normalize(qm.astype(np.float64))
    probe = np.argsort(-(qn @ centroids.T), axis=1)[:, :2]
    paths = _partition_paths(os.path.join(index_dir, "data"), "list_id",
                             set(int(v) for v in probe.ravel()))
    assert {os.path.dirname(p) for p in paths}.issubset(set(all_parts))

    out = ivf_query_index(index_dir, qm, qids, k=1, nprobe=3)
    assert len(out) == len(qids)
    assert (out["vec_id"] != out["q_id"]).all()


def test_ivf_matches_brute_force_with_full_probe(ray_session, emb_ds,
                                                 queries):
    """nprobe = n_lists degenerates to exact search: results must equal
    the brute-force baseline."""
    from tokrle.functions.ann import brute_force_topk, ivf_query_index

    index_dir = os.path.join(WORK, "ivf")
    qm, qids = queries
    exact = brute_force_topk(emb_ds, qm, qids, k=1) \
        .sort_values("q_id").reset_index(drop=True)
    full = ivf_query_index(index_dir, qm, qids, k=1, nprobe=8) \
        .sort_values("q_id").reset_index(drop=True)
    assert full["vec_id"].tolist() == exact["vec_id"].tolist()


def test_axis_lsh_buckets_are_coordinate_signs(ray_session, emb_ds,
                                               queries):
    """axis_planes=True: bucket bits must equal sign(embedding[i]) — the
    SQL-reproducible invariant the lsh_ann_top1 oracle relies on."""
    from tokrle.functions.ann import lsh_build_index

    d = os.path.join(WORK, "axis6")
    shutil.rmtree(d, ignore_errors=True)
    lsh_build_index(emb_ds, d, n_planes=6, axis_planes=True)
    planes = np.load(os.path.join(d, "planes.npy"))
    assert np.array_equal(planes, np.eye(6, planes.shape[1]))
    df = emb_ds.to_pandas()
    import pandas as pd
    import pyarrow.parquet as pq
    import pyarrow.dataset as pads

    got = pads.dataset(os.path.join(d, "data"), partitioning="hive") \
        .to_table(columns=["vec_id", "bucket"]).to_pandas()
    m = np.stack(df["embedding"].map(np.asarray).to_list())
    want = ((m[:, :6] > 0) << np.arange(6)).sum(axis=1)
    merged = df[["vec_id"]].assign(want=want).merge(got, on="vec_id")
    assert (merged["want"].astype(int)
            == merged["bucket"].astype(int)).all()


def test_ivf_medoid_centroids_are_table_rows(ray_session, emb_ds):
    """medoid_ids pins centroids to normalized table rows, in order."""
    from tokrle.functions.ann import _normalize, ivf_build_index

    d = os.path.join(WORK, "ivf_medoid")
    shutil.rmtree(d, ignore_errors=True)
    mids = [5, 15, 25, 35]
    ivf_build_index(emb_ds, d, medoid_ids=mids)
    cents = np.load(os.path.join(d, "centroids.npy"))
    df = emb_ds.to_pandas().set_index("vec_id")
    want = _normalize(np.stack(
        [np.asarray(df.loc[i, "embedding"], dtype=np.float64)
         for i in mids]))
    assert np.allclose(cents, want)
    # one hive partition per non-empty list
    parts = glob.glob(os.path.join(d, "data", "list_id=*"))
    assert 1 <= len(parts) <= len(mids)


def test_pq_rerank_equals_brute_force(ray_session, emb_ds, queries):
    """ADC top-R + exact rerank == exact brute-force top-1 (the
    containment invariant behind the pq_ann_stats oracle)."""
    from tokrle.functions.ann import brute_force_topk
    from tokrle.functions.pq import pq_encode, pq_rerank_topk, pq_train

    qs, qids = queries
    books = pq_train(emb_ds, m=16, k=256, iters=8, seed=31)
    code_ds = pq_encode(emb_ds, books)
    got = pq_rerank_topk(emb_ds, code_ds, qs, qids, books, k=1, rerank=64)
    want = brute_force_topk(emb_ds, qs, qids, k=1)
    assert got.sort_values("q_id")[["q_id", "vec_id"]].values.tolist() \
        == want.sort_values("q_id")[["q_id", "vec_id"]].values.tolist()
