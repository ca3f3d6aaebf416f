"""Tests for training-data operators: dedup variants, ANN, text analysis,
multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data

    return ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "source", "text"])


def test_exact_dedup_matches_pandas(ray_session, docs_ds):
    from tokrle.functions.dedup import exact_dedup

    got = exact_dedup(docs_ds, key="text").to_pandas()
    df = docs_ds.to_pandas()
    want = df.sort_values("doc_id").drop_duplicates("text", keep="first")
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])


def test_minhash_identical_docs_collapse(ray_session):
    import ray.data

    base = pd.DataFrame({
        "doc_id": np.arange(40),
        "source": ["s"] * 40,
        "text": (["alpha beta gamma delta epsilon zeta eta theta"] * 20
                 + [f"unique text number {i} with words {i*7} {i*13} etc"
                    for i in range(20)]),
    })
    from tokrle.functions.dedup import minhash_lsh_dedup

    survivors = minhash_lsh_dedup(ray.data.from_pandas(base)).to_pandas()
    # 20 identical docs collapse to 1 leader; unique docs mostly survive
    assert 0 in survivors["doc_id"].tolist()
    assert not set(range(1, 20)) & set(survivors["doc_id"])
    assert len(survivors) >= 15


def test_minhash_verified_pairs_equals_bruteforce(ray_session):
    """The minhash self-oracle: LSH candidates + exact verification must
    equal brute-force all-pairs word-shingle Jaccard (threshold 1/2),
    including clamped shingles for docs shorter than k words and exact
    duplicates."""
    import itertools

    import ray.data

    from tokrle.functions.dedup import minhash_verified_pairs

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(200)]
    docs = []
    for i in range(30):
        words = list(rng.choice(vocab, size=rng.integers(5, 40)))
        docs.append((f"d{i:03d}", " ".join(words), "s0"))
    for j in range(6):           # planted near-dups (one word changed)
        words = docs[j][1].split(" ")
        if len(words) > 6:
            words[2] = "XX"
        docs.append((f"n{j:03d}", " ".join(words), "s0"))
    docs.append(("e000", docs[0][1], "s0"))          # exact duplicate
    docs += [("t000", "a b", "s0"), ("t001", "a b", "s0"),
             ("t002", "a", "s0")]                    # shorter than k
    df = pd.DataFrame(docs, columns=["doc_id", "text", "source"])

    def shingles(text, k=3):
        w = text.split(" ")
        n = len(w)
        return {tuple(w[min(i + j, n - 1)] for j in range(k))
                for i in range(max(n - k + 1, 1))}

    exact = set()
    for (ia, ta), (ib, tb) in itertools.combinations(
            zip(df.doc_id, df.text), 2):
        sa, sb = shingles(ta), shingles(tb)
        inter, union = len(sa & sb), len(sa | sb)
        if union and inter * 2 >= union:
            a, b = sorted((ia, ib))
            exact.add((a, b, inter, union))

    got = minhash_verified_pairs(ray.data.from_pandas(df)).to_pandas()
    got_t = set(got.itertuples(index=False, name=None))
    assert got_t == exact
    assert len(exact) >= 8      # the planted structure actually surfaced


def test_ngram_jaccard_finds_identical(ray_session):
    import ray.data

    base = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "source": ["s"] * 3,
        "text": ["the quick brown fox jumps over the lazy dog",
                 "the quick brown fox jumps over the lazy dog",
                 "completely different words entirely here now folks"],
    })
    from tokrle.functions.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(ray.data.from_pandas(base),
                                threshold=0.9).to_pandas()
    assert len(pairs) == 1
    assert {pairs["doc_a"][0], pairs["doc_b"][0]} == {1, 2}
    assert pairs["jaccard"][0] == 1.0


def test_embedding_near_dups(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    base_vecs = rng.standard_normal((20, 16))
    vecs = np.concatenate([base_vecs, base_vecs[:3] * 1.001])  # 3 near-dups
    df = pd.DataFrame({"vec_id": np.arange(len(vecs)),
                       "embedding": list(vecs.astype(np.float32))})
    from tokrle.functions.dedup import embedding_near_dups

    pairs = embedding_near_dups(ray.data.from_pandas(df),
                                threshold=0.999).to_pandas()
    found = {frozenset((a, b)) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert {frozenset((i, 20 + i)) for i in range(3)} <= found


def test_brute_force_vs_lsh_topk(ray_session):
    import ray.data

    from tokrle.functions.ann import brute_force_topk, lsh_topk

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    df = ds.to_pandas().sort_values("vec_id").head(3)
    queries = np.stack(df["embedding"].map(np.asarray).to_list())
    qids = df["vec_id"].to_numpy()
    exact = brute_force_topk(ds, queries, qids, k=5)
    approx = lsh_topk(ds, queries, qids, k=5, n_planes=4)
    # exact: 5 neighbours per query, ranked
    assert len(exact) == 15
    assert set(exact["rank"]) == {1, 2, 3, 4, 5}
    # lsh recall vs exact should be substantial on 4 planes with 1-mismatch probing
    e = {(q, v) for q, v in zip(exact["q_id"], exact["vec_id"])}
    a = {(q, v) for q, v in zip(approx["q_id"], approx["vec_id"])}
    assert len(e & a) / len(e) >= 0.4


def test_simhash_hamming_similarity(ray_session):
    import pyarrow as pa
    import ray.data

    from tokrle.functions.dedup import simhash_batch

    toks = np.arange(300, dtype=np.int32)
    toks2 = toks.copy()
    toks2[:5] += 1  # tiny perturbation
    rand = (np.arange(300, dtype=np.int32) * 7919) % 50000
    t = pa.table({
        "doc_id": pa.array(["a", "b", "c"]),
        "source": pa.array(["s"] * 3),
        "tokens": pa.array([toks.tolist(), toks2.tolist(), rand.tolist()],
                           type=pa.list_(pa.int32())),
        "n_tok": pa.array([300, 300, 300], type=pa.int32()),
    })
    out = simhash_batch(t).to_pandas()
    h = dict(zip(out["doc_id"], out["simhash"]))
    d_ab = bin(h["a"] ^ h["b"]).count("1")
    d_ac = bin(h["a"] ^ h["c"]).count("1")
    assert d_ab < d_ac  # similar docs closer in Hamming space


def test_multimodal_image_pipeline(ray_session):
    from tokrle.functions.multimodal import (image_feature_pipeline,
                                             synth_media_table)

    media = synth_media_table(20)
    feats = image_feature_pipeline(media, out_size=8).to_pandas()
    assert len(feats) == 20
    assert all(len(f) == 8 for f in feats["features"])
    # deterministic: same table regenerated gives same features
    feats2 = image_feature_pipeline(synth_media_table(20), out_size=8).to_pandas()
    a = np.stack(feats.sort_values("item_id")["features"].map(np.asarray))
    b = np.stack(feats2.sort_values("item_id")["features"].map(np.asarray))
    assert np.allclose(a, b)


def test_multimodal_real_decoder_gated(ray_session):
    from tokrle.functions.multimodal import real_decode_image

    with pytest.raises(NotImplementedError):
        real_decode_image(b"xx", 4, 4)


def test_audio_frame_sampler(ray_session):
    import pyarrow as pa

    from tokrle.functions.multimodal import AudioFrameSampler

    pcm = (np.sin(np.linspace(0, 100, 5000)) * 10000).astype(np.int16)
    t = pa.table({
        "item_id": pa.array(["a1"]),
        "media": pa.array([pcm.tobytes()], type=pa.binary()),
    })
    out = AudioFrameSampler(window=512, n_windows=3)(t).to_pandas()
    assert len(out) == 3
    assert (out["rms"] > 0).all()


def test_lang_id_stateful_stage(ray_session):
    import ray.data

    from tokrle.functions.text import LangId

    df = pd.DataFrame({
        "doc_id": [1, 2],
        "source": ["s", "s"],
        "lang": ["en", "es"],
        "text": ["the quick brown fox jumps over the lazy dog",
                 "el rapido zorro marron salta sobre el perro"],
    })
    out = ray.data.from_pandas(df).map_batches(
        LangId, batch_format="pyarrow", concurrency=1).to_pandas()
    assert out.loc[out["doc_id"] == 1, "pred_lang"].iloc[0] == "en"
    assert out.loc[out["doc_id"] == 2, "pred_lang"].iloc[0] == "es"


def test_ivf_topk_recall(ray_session):
    import ray.data

    from tokrle.functions.ann import brute_force_topk, ivf_topk

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    df = ds.to_pandas().sort_values("vec_id").head(3)
    queries = np.stack(df["embedding"].map(np.asarray).to_list())
    qids = df["vec_id"].to_numpy()
    exact = brute_force_topk(ds, queries, qids, k=5)
    approx = ivf_topk(ds, queries, qids, k=5, n_lists=8, nprobe=3)
    e = {(q, v) for q, v in zip(exact["q_id"], exact["vec_id"])}
    a = {(q, v) for q, v in zip(approx["q_id"], approx["vec_id"])}
    assert len(e & a) / len(e) >= 0.5


def test_semi_join_cogroup(ray_session):
    import ray.data

    from tokrle.functions.dedup import semi_join

    data = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2, 3, 4, 5], "v": list("abcde")}))
    keep = ray.data.from_pandas(pd.DataFrame({"doc_id": [2, 4, 4, 9]}))
    out = semi_join(data, keep, on="doc_id").to_pandas()
    assert sorted(out["doc_id"].tolist()) == [2, 4]
    assert sorted(out["v"].tolist()) == ["b", "d"]


def test_exact_dedup_return_full_rows(ray_session):
    import ray.data

    from tokrle.functions.dedup import exact_dedup

    df = pd.DataFrame({
        "doc_id": [3, 1, 2, 4],
        "source": ["s1", "s1", "s2", "s2"],
        "text": ["dup", "dup", "uniq", "dup"],
    })
    out = exact_dedup(ray.data.from_pandas(df), key="text",
                      keep_cols=("source",),
                      return_full_rows=True).to_pandas()
    # min doc_id per distinct text survives, with full columns
    assert sorted(out["doc_id"].tolist()) == [1, 2]
    assert set(out.columns) == {"doc_id", "source", "text"}


def test_audio_window_sampler(ray_session):
    from tokrle.functions.multimodal import AudioFrameSampler, synth_media_table

    out = synth_media_table(8, kind="audio").map_batches(
        AudioFrameSampler, batch_size=4, batch_format="pyarrow",
        concurrency=1).to_pandas()
    assert len(out) == 8 * 4          # n_windows per item
    assert (out["rms"] >= 0).all()


def test_video_frame_sampler(ray_session):
    from tokrle.functions.multimodal import (VideoFrameSampler,
                                             synth_media_table)

    out = synth_media_table(6, kind="video").map_batches(
        VideoFrameSampler, batch_size=4, batch_format="pyarrow",
        concurrency=1).to_pandas()
    assert len(out) == 6 * 4
    assert set(out["frame"]) == {0, 1, 2, 3}
    # frames differ (the rotation stand-in produces distinct content)
    g = out.groupby("item_id")["mean_intensity"].nunique()
    assert (g > 1).all()


def test_sliding_partial_agg_matches_event_expansion(ray_session):
    """The step-partial composition must produce exactly the same
    (key, window) -> count/min/max as the k-fold event expansion."""
    import ray.data
    from ray.data.aggregate import Count, Max, Min

    from tokrle.functions.windows import (sliding_window_assign,
                                          sliding_window_partial_agg)

    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": rng.choice(["a", "b", "c"], size=n),
        "ts": pd.to_datetime(rng.integers(0, 10**7, size=n) * 10**6,
                             unit="us"),
    })
    ds = ray.data.from_pandas(df).repartition(8)

    got = sliding_window_partial_agg(
        ds, window_seconds=3600, step_seconds=900).to_pandas()

    assigned = sliding_window_assign(ds, window_seconds=3600,
                                     step_seconds=900,
                                     keep_cols=("event_type", "event_id"))
    want = assigned.groupby(["event_type", "window_id"]) \
        .aggregate(Count(alias_name="n_events"),
                   Min("event_id", alias_name="min_eid"),
                   Max("event_id", alias_name="max_eid")).to_pandas()

    key = ["event_type", "window_id"]
    got = got.sort_values(key).reset_index(drop=True)[want.columns]
    want = want.sort_values(key).reset_index(drop=True)
    for c in ("window_id", "n_events", "min_eid", "max_eid"):
        got[c] = got[c].astype("int64")
        want[c] = want[c].astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_minhash_clusters_consistent_with_dedup(ray_session):
    import ray.data

    from tokrle.functions.dedup import minhash_clusters, minhash_lsh_dedup

    base = pd.DataFrame({
        "doc_id": np.arange(30),
        "source": ["s"] * 30,
        "text": (["alpha beta gamma delta epsilon zeta eta theta"] * 10
                 + [f"unique text number {i} with words {i*7} {i*13} etc"
                    for i in range(20)]),
    })
    ds = ray.data.from_pandas(base)
    cl = minhash_clusters(ds).to_pandas()
    assert len(cl) == 30                       # every doc gets a cluster
    # the 10 identical docs all point at leader 0
    dup = cl[cl["doc_id"] < 10]
    assert (dup["cluster"] == 0).all()
    # survivor semantics match the dedup operator exactly
    survivors = set(
        minhash_lsh_dedup(ray.data.from_pandas(base)).to_pandas()["doc_id"])
    assert set(cl.loc[cl["cluster"] == cl["doc_id"], "doc_id"]) == survivors


@pytest.mark.parametrize("seed", [3, 17])
def test_minhash_dedup_matches_brute_force_reference(ray_session, seed):
    """Differential gate for the distributed LSH shape: an in-process
    brute-force reference (same MinHasher signatures, same band-hash
    formula, explicit bucket dict, leader = min doc_id per bucket) must
    produce exactly the survivor set the two-shuffle pipeline computes."""
    import pyarrow as pa

    import ray.data

    from tokrle.functions.dedup import MinHasher, minhash_lsh_dedup

    rng = np.random.default_rng(seed)
    vocab = ["red", "green", "blue", "cyan", "teal", "plum", "gold",
             "jade", "rust", "sand"]
    texts = []
    for i in range(60):
        if i % 5 == 0 and i:
            texts.append(texts[rng.integers(0, len(texts))])  # planted dup
        else:
            texts.append(" ".join(
                vocab[j] for j in rng.integers(0, len(vocab), 12)))
    base = pd.DataFrame({
        "doc_id": np.arange(60), "source": ["s"] * 60, "text": texts,
    })

    num_perm, bands = 64, 16
    rows_per_band = num_perm // bands
    hasher = MinHasher(num_perm=num_perm, shingle_k=3)
    sig_tbl = hasher(pa.table(base))
    flat = sig_tbl.column("signature").combine_chunks().flatten() \
        .to_numpy(zero_copy_only=False)
    sig = np.ascontiguousarray(flat).view(np.uint64).reshape(60, num_perm)
    buckets: dict[tuple[int, int], list[int]] = {}
    for i in range(60):
        for bidx in range(bands):
            bh = np.uint64(0xCBF29CE484222325)
            for c in range(rows_per_band):
                bh = bh * np.uint64(1099511628211) + \
                    sig[i, bidx * rows_per_band + c]
            buckets.setdefault((bidx, int(bh)), []).append(i)
    dropped = {i for ids in buckets.values() for i in ids if i != min(ids)}
    want = set(range(60)) - dropped

    got = set(minhash_lsh_dedup(
        ray.data.from_pandas(base)).to_pandas()["doc_id"])
    assert got == want


def test_label_propagation_transitive_chain(ray_session):
    """A bucket chain 0-1, 1-2, 2-3 must collapse to one component: each
    round moves labels one bucket-hop, so the 3-hop chain needs 3."""
    import ray.data

    from tokrle.functions.dedup import _propagate_labels

    edges = pd.DataFrame({
        "doc_id": [0, 1, 1, 2, 2, 3],
        "source": ["s"] * 6,
        "bucket": [10, 10, 20, 20, 30, 30],
        "label":  [0, 1, 1, 2, 2, 3],
    })

    def labels_after(rounds):
        out = _propagate_labels(ray.data.from_pandas(edges), rounds) \
            .to_pandas().groupby("doc_id")["label"].min()
        return out.to_dict()

    assert labels_after(1) == {0: 0, 1: 0, 2: 1, 3: 2}
    assert labels_after(2) == {0: 0, 1: 0, 2: 0, 3: 1}
    assert labels_after(3) == {0: 0, 1: 0, 2: 0, 3: 0}


def test_connected_clusters_collapse_identical_docs(ray_session):
    import ray.data

    from tokrle.functions.dedup import minhash_connected_clusters

    base = pd.DataFrame({
        "doc_id": np.arange(20),
        "source": ["s"] * 20,
        "text": (["same exact text repeated here again and again ok"] * 8
                 + [f"unique document number {i} words {i*3} {i*11} more"
                    for i in range(12)]),
    })
    cl = minhash_connected_clusters(
        ray.data.from_pandas(base), rounds=2).to_pandas()
    assert len(cl) == 20
    assert (cl.loc[cl["doc_id"] < 8, "cluster"] == 0).all()


def test_minhash_hot_bucket_combiner_exact(ray_session):
    """A giant identical-doc cluster (hot LSH bucket) must still dedup to
    exactly one survivor with the map-side combiner, across many batches
    (MinHasher batch_size=1024 -> this spans 3 batches)."""
    import ray.data

    from tokrle.functions.dedup import minhash_lsh_dedup

    n = 3000
    base = pd.DataFrame({
        "doc_id": np.arange(n),
        "source": ["s"] * n,
        "text": ["hot cluster identical text body words words words"] * n,
    })
    # NOTE: no upstream .repartition() here — an extra AllToAll op in the
    # same plan as the hash shuffle + aggregate oversubscribes the 4-CPU
    # test host and stalls the executor (same class of limit as
    # _join_partitions documents).  MinHasher's batch_size=1024 already
    # splits 3000 docs into 3 batches, which is what the combiner needs.
    survivors = minhash_lsh_dedup(ray.data.from_pandas(base)).to_pandas()
    assert survivors["doc_id"].tolist() == [0]


def test_doc_repetition_partials_oracle():
    """Vectorized per-doc max-unigram-run stats vs a per-doc Python oracle,
    including empty docs, all-same docs, and the eligibility threshold."""
    import pyarrow as pa
    from collections import Counter

    from tokrle.functions.text import doc_repetition_partials

    rng = np.random.default_rng(7)
    docs, srcs = [], []
    for i in range(60):
        n = int(rng.integers(0, 60))
        docs.append(rng.integers(0, 8, size=n).astype(np.int32))
        srcs.append(f"s{i % 3}")
    docs.append(np.zeros(0, dtype=np.int32))          # empty doc
    srcs.append("s0")
    docs.append(np.full(25, 4, dtype=np.int32))       # all-same, eligible
    srcs.append("s1")
    offsets = np.concatenate(([0], np.cumsum([len(d) for d in docs])))
    batch = pa.table({
        "doc_id": pa.array([str(i) for i in range(len(docs))]),
        "tokens": pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            pa.array(np.concatenate(docs), type=pa.int32())),
        "source": pa.array(srcs),
    })
    out = doc_repetition_partials(batch).to_pandas() \
        .groupby("source", as_index=False).sum().sort_values("source")

    exp = {}
    for d, s in zip(docs, srcs):
        e = len(d) >= 20
        r = e and max(Counter(d.tolist()).values()) * 5 >= len(d)
        a, b = exp.get(s, (0, 0))
        exp[s] = (a + int(e), b + int(r))
    for _, row in out.iterrows():
        assert (row["n_eligible"], row["n_repetitive"]) == exp[row["source"]]


def test_gopher_ngram_stats_oracle():
    """Vectorized per-doc bigram/trigram repetition stats vs a per-doc
    Counter oracle, plus the partials' integer threshold rules — covering
    empty docs, 1/2-word docs, and a planted all-repeats doc."""
    import pyarrow as pa
    from collections import Counter

    from tokrle.functions.text import doc_ngram_stats, gopher_ngram_partials

    rng = np.random.default_rng(11)
    docs, srcs = [], []
    for i in range(80):
        n = int(rng.integers(0, 50))
        docs.append(rng.integers(0, 7, size=n).astype(np.int32))
        srcs.append(f"s{i % 3}")
    for planted in ([], [3], [1, 2],
                    [5, 6] * 15):                     # all-repeats, eligible
        docs.append(np.asarray(planted, dtype=np.int32))
        srcs.append("s0")
    offsets = np.concatenate(([0], np.cumsum([len(d) for d in docs])))
    batch = pa.table({
        "doc_id": pa.array([str(i) for i in range(len(docs))]),
        "tokens": pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            pa.array(np.concatenate(docs) if offsets[-1] else
                     np.zeros(0, dtype=np.int32), type=pa.int32())),
        "source": pa.array(srcs),
    })

    s = doc_ngram_stats(batch)
    exp = {}
    for i, (d, src) in enumerate(zip(docs, srcs)):
        d = d.tolist()
        bg = Counter(zip(d[:-1], d[1:]))
        tg = Counter(zip(d[:-2], d[1:-1], d[2:]))
        c2 = max(bg.values()) if bg else 0
        dup3 = sum(v for v in tg.values() if v >= 2)
        assert s["n_words"][i] == len(d)
        assert s["c2"][i] == c2
        assert s["dup3"][i] == dup3
        assert s["n2"][i] == max(len(d) - 1, 0)
        assert s["n3"][i] == max(len(d) - 2, 0)
        e = len(d) >= 20
        t2 = e and c2 * 18 >= len(d) - 1
        t3 = e and dup3 * 50 >= len(d) - 2
        a, b, c = exp.get(src, (0, 0, 0))
        exp[src] = (a + int(e), b + int(t2), c + int(t3))

    out = gopher_ngram_partials(batch).to_pandas() \
        .groupby("source", as_index=False).sum().sort_values("source")
    for _, row in out.iterrows():
        got = (row["n_eligible"], row["n_top_bigram"], row["n_dup_trigram"])
        assert got == exp[row["source"]]
    # the planted all-repeats doc must trip both rules
    planted = docs[-1]
    i = len(docs) - 1
    assert s["c2"][i] * 18 >= len(planted) - 1
    assert s["dup3"][i] * 50 >= len(planted) - 2


def test_clean_corpus_pipeline(ray_session, tmp_path):
    """End-to-end cleaning: short docs and repetitive docs filtered,
    exact dups collapse to min doc_id, output hive-partitioned by
    source, counts from parquet metadata only."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tokrle.pipelines.clean import clean_corpus

    good = "the quick brown fox jumps over a lazy dog near the old " \
           "river bank while birds sing softly above green trees today"
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "source": ["a", "a", "b", "b", "a", "b"],
        "text": [
            good,                        # 0: kept
            "too short",                 # 1: dropped (len)
            good,                        # 2: dup of 0 -> dropped
            "spam " * 30,                # 3: dropped (repetitive)
            good + " extra",             # 4: kept (distinct)
            "word " * 10 + good,         # 5: kept (maxrun 11 < 31/5? no ->
                                         #    11*5 >= 31: dropped repetitive)
        ],
    })
    src = tmp_path / "docs.parquet"
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(src))
    out = clean_corpus(str(src), str(tmp_path / "clean"))
    assert out["n_in"] == 6
    kept = pq.read_table(str(tmp_path / "clean")).to_pandas()
    assert sorted(kept["doc_id"].tolist()) == [0, 4]
    assert out["n_kept"] == 2
    # hive partition dirs by source exist
    import os
    assert any(d.startswith("source=") for d in
               os.listdir(tmp_path / "clean"))


def test_semi_anti_join_single_key_partition(ray_session):
    """Regression: a build side whose keys hash into a SUBSET of the join
    partitions (here: one key) crashed Ray's native semi/anti join with
    ArrowInvalid (schema-less empty partition in Acero); the tagged
    co-group must handle it."""
    import ray.data

    from tokrle.functions.dedup import anti_join, semi_join

    data = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2, 3, 4, 5], "v": list("abcde")}))
    keep = ray.data.from_pandas(pd.DataFrame({"doc_id": [3]}))
    out = semi_join(data, keep, on="doc_id", num_partitions=4).to_pandas()
    assert out["doc_id"].tolist() == [3] and out["v"].tolist() == ["c"]
    out = anti_join(data, keep, on="doc_id", num_partitions=4).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [1, 2, 4, 5]


def test_ngram_jaccard_matches_set_oracle(ray_session):
    """Vectorized collision-count Jaccard must equal exact set Jaccard
    for every emitted pair, and identical copies must always pair
    (regression for the r3 inverted-index rewrite of pairs_in_block)."""
    import pyarrow as pa
    import ray.data

    from tokrle.functions.dedup import (_word_shingles_hashed,
                                        ngram_jaccard_pairs)

    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(30)]
    docs, ids = [], []
    for fam in range(6):
        base = [words[i] for i in rng.integers(0, 30, 25)]
        for v in range(10):
            t = list(base)
            for _ in range(v // 3):      # v in 0..2 stay identical
                t[int(rng.integers(0, len(t)))] = \
                    words[int(rng.integers(0, 30))]
            docs.append(" ".join(t))
            ids.append(fam * 100 + v)
    base_df = pd.DataFrame({"doc_id": ids, "source": ["s"] * len(ids),
                            "text": docs})
    pairs = ngram_jaccard_pairs(ray.data.from_pandas(base_df),
                                threshold=0.3).to_pandas()
    hashes, offs = _word_shingles_hashed(pa.array(docs), 3)
    sets = {ids[i]: set(hashes[offs[i]:offs[i + 1]].tolist())
            for i in range(len(ids))}
    assert len(pairs) > 0
    for a, b, j in pairs[["doc_a", "doc_b", "jaccard"]].itertuples(
            index=False):
        exact = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        assert abs(j - exact) < 1e-12, (a, b)
    got = {(a, b) for a, b in
           pairs[["doc_a", "doc_b"]].itertuples(index=False)}
    for fam in range(6):        # identical copies share a block: must pair
        f = fam * 100
        for pair in ((f, f + 1), (f, f + 2), (f + 1, f + 2)):
            assert pair in got, pair


def test_ngram_jaccard_rejects_nonpositive_threshold(ray_session):
    import ray.data

    from tokrle.functions.dedup import ngram_jaccard_pairs

    with pytest.raises(ValueError):
        ngram_jaccard_pairs(ray.data.from_items([]), threshold=0.0)


def test_group_blocks_survives_small_block_target(ray_session):
    """Pin the Ray-2.49 coupling _group_blocks relies on: hash-shuffle
    finalize emits ONE block per partition even when that block far
    exceeds target_max_block_size, so map_batches(batch_size=None) sees
    complete key groups.  If a future Ray splits finalized partitions,
    this fails and every per-block fold must be re-keyed (see the
    _group_blocks docstring)."""
    import ray.data

    from tokrle.functions.dedup import _group_blocks

    n = 40_000
    df = pd.DataFrame({
        "k": np.repeat([f"key{i}" for i in range(8)], n // 8),
        "payload": ["x" * 64] * n,     # ~2.5 MB total
    })
    ds = ray.data.from_pandas(df).repartition(16)
    # far below one key group's size: a block-splitting finalize would
    # have to fragment groups to honor it
    ds.context.target_max_block_size = 4096

    def batch_keys(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"keys": [",".join(sorted(set(batch["k"])))],
                             "rows": [len(batch)]})

    seen = _group_blocks(ds, ["k"], num_partitions=4).map_batches(
        batch_keys, batch_size=None, batch_format="pandas").to_pandas()
    nonempty = seen[seen["rows"] > 0]
    all_keys = [k for ks in nonempty["keys"] for k in ks.split(",")]
    # every key in exactly one batch, and all rows accounted for
    assert sorted(all_keys) == sorted(set(all_keys))
    assert set(all_keys) == {f"key{i}" for i in range(8)}
    assert nonempty["rows"].sum() == n


def test_pack_sequences_explicit(ray_session):
    """Known tiny corpus: exact packed examples, EOS placement, padding."""
    import ray.data

    from tokrle.functions.packing import pack_sequences

    df = pd.DataFrame({
        "doc_id": ["a", "b", "c"],
        "source": ["s1", "s1", "s2"],
        "tokens": [np.array([10, 11, 12], dtype=np.int32),
                   np.array([20], dtype=np.int32),
                   np.array([30, 31], dtype=np.int32)],
    })
    packed = pack_sequences(ray.data.from_pandas(df), seq_len=4, eos=99,
                            pad=0, key_col="source") \
        .to_pandas().sort_values(["key", "example_idx"])
    got = {(r["key"], r["example_idx"]): (list(r["input_ids"]), r["n_real"])
           for _, r in packed.iterrows()}
    # s1: [10,11,12,EOS, 20,EOS] -> [10,11,12,99] + [20,99,0,0]
    assert got[("s1", 0)] == ([10, 11, 12, 99], 4)
    assert got[("s1", 1)] == ([20, 99, 0, 0], 2)
    # s2: [30,31,EOS] -> [30,31,99,0]
    assert got[("s2", 0)] == ([30, 31, 99, 0], 3)
    assert len(got) == 3


def test_pack_sequences_conservation_and_partitioning(ray_session):
    """Packing is partitioning-invariant and conserves the token multiset:
    per-source sums and example counts match the closed form regardless of
    input block layout."""
    import ray.data

    from tokrle.functions.packing import pack_sequences

    rng = np.random.default_rng(11)
    n = 300
    df = pd.DataFrame({
        "doc_id": [f"d{i:04d}" for i in range(n)],
        "source": [f"s{i % 5}" for i in range(n)],
        "tokens": [rng.integers(4, 1000, rng.integers(0, 40))
                   .astype(np.int32) for _ in range(n)],
    })
    L, EOS = 64, 2

    def stats(num_blocks):
        ds = ray.data.from_pandas(df).repartition(num_blocks)
        p = pack_sequences(ds, seq_len=L, eos=EOS, pad=0).to_pandas()
        assert all(len(x) == L for x in p["input_ids"])
        return {
            k: (len(g), sum(int(np.sum(x)) for x in g["input_ids"]),
                int(g["n_real"].sum()))
            for k, g in p.groupby("key")
        }

    a = stats(3)
    assert a == stats(11)
    for src, (n_ex, total, n_real) in a.items():
        sel = df[df["source"] == src]
        tok_sum = int(sum(int(t.sum()) for t in sel["tokens"]))
        n_with_eos = int(sel["tokens"].map(len).sum()) + len(sel)
        assert n_real == n_with_eos
        assert n_ex == -(-n_with_eos // L)
        assert total == tok_sum + EOS * len(sel)


def test_mixture_sample_deterministic_and_weighted(ray_session):
    """Mixture sampling is a pure function of doc_id: identical rows kept
    under any partitioning, zero-weight sources fully dropped, keep rates
    near the weights, and numpy matches the SQL predicate row-for-row."""
    import duckdb
    import ray.data

    from tokrle.functions.mixture import (mixture_mask,
                                          mixture_sql_predicate,
                                          sample_mixture)

    n = 4000
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64) * 17 + 3,
        "source": [f"s{i % 4}" for i in range(n)],
        "n_chars": np.arange(n, dtype=np.int64) % 100,
    })
    weights = {"s0": 0.25, "s1": 1.0, "s2": 0.0}
    kept_a = sample_mixture(ray.data.from_pandas(df), weights, seed=5,
                            default_weight=0.5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    kept_b = sample_mixture(ray.data.from_pandas(df).repartition(13),
                            weights, seed=5, default_weight=0.5) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert kept_a["doc_id"].tolist() == kept_b["doc_id"].tolist()
    rates = kept_a.groupby("source").size() / df.groupby("source").size()
    assert "s2" not in kept_a["source"].values
    assert abs(rates.get("s0", 0) - 0.25) < 0.05
    assert rates["s1"] == 1.0
    assert abs(rates["s3"] - 0.5) < 0.05
    con = duckdb.connect()
    con.register("t", df)
    pred = mixture_sql_predicate(weights, seed=5, default_weight=0.5)
    sql_ids = con.execute(
        f"SELECT doc_id FROM t WHERE {pred} ORDER BY doc_id").df()
    assert kept_a["doc_id"].tolist() == sql_ids["doc_id"].tolist()


def test_mixture_mask_negative_ids_match_sql():
    """Negative ids: numpy % floors, SQL % truncates toward zero — the
    bitand reduction must keep the two engines row-identical."""
    import duckdb

    from tokrle.functions.mixture import mixture_mask, mixture_sql_predicate

    ids = np.array([-1, -3, -5, -2**40, 0, 7, 2**40], dtype=np.int64)
    w = np.full(len(ids), 0.5)
    mask = mixture_mask(ids, w, seed=7)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"doc_id": ids, "source": ["s"] * len(ids)}))
    pred = mixture_sql_predicate({}, seed=7, default_weight=0.5)
    sql_ids = set(con.execute(
        f"SELECT doc_id FROM t WHERE {pred}").df()["doc_id"])
    assert set(ids[mask].tolist()) == sql_ids


def test_png_truncated_raises_valueerror():
    from tokrle.functions.png import decode_png, encode_png

    png = encode_png(np.zeros((8, 8, 3), dtype=np.uint8))
    for cut in (12, 20, len(png) - 5):
        with pytest.raises(ValueError):
            decode_png(png[:cut])


def test_word_ngram_hashes_exact_counts_and_equality():
    import pyarrow as pa

    from tokrle.functions.decontam import word_ngram_hashes

    texts = pa.array([
        "a b c d e",          # 5 words, k=3 -> 3 grams
        "a b",                # 2 words -> 0 grams
        "",                   # split gives one empty word -> 0 grams
        "c d e a b",          # shares gram "c d e" with doc 0
    ])
    h1, h2, offs = word_ngram_hashes(texts, 3)
    assert offs.tolist() == [0, 3, 3, 3, 6]
    # same literal 3-gram hashes identically across docs
    assert h1[2] == h1[3] and h2[2] == h2[3]          # "c d e"
    # distinct grams hash differently (both mixes)
    assert len(set(zip(h1.tolist(), h2.tolist()))) == 5


def test_decontaminate_planted_overlap(ray_session):
    import ray.data

    from tokrle.functions.decontam import decontaminate, flag_contaminated

    evald = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [0],
        "text": ["the quick brown fox jumps over the lazy dog tonight"],
    }))
    train = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            # contains the eval 8-gram "quick brown fox jumps over the lazy dog"
            "prefix words quick brown fox jumps over the lazy dog suffix",
            "totally different content with no overlap at all here okay",
            "quick brown fox jumps over the lazy cat instead of dog",  # 7-gram only
            "short doc",                                   # < k words
        ],
    }))
    flagged = flag_contaminated(train, evald, k=8).to_pandas() \
        .sort_values("doc_id")
    assert flagged["contaminated"].tolist() == [True, False, False, False]
    clean = decontaminate(train, evald, k=8).to_pandas()
    assert sorted(clean["doc_id"]) == [2, 3, 4]
    assert "contaminated" not in clean.columns


def test_decontam_stats_matches_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as E

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    got = E.queries()["decontam_stats"](sf)
    want = con.sql(E.oracle_sql()["decontam_stats"]).df()
    cols = sorted(got.columns)
    assert got[cols].astype(str).sort_values(cols).reset_index(drop=True) \
        .equals(want[cols].astype(str).sort_values(cols).reset_index(drop=True))


def test_remove_dup_spans_planted(ray_session):
    import ray.data

    from tokrle.functions.dupspan import remove_dup_spans

    base = pd.DataFrame({
        "doc_id": np.arange(4),
        "text": [
            "one two three four five six seven eight nine ten",
            "one two three four five six seven eight different tail",
            "completely unrelated words here that do not repeat at all",
            "x y z",                     # < k words: untouched
        ],
    })
    out = remove_dup_spans(ray.data.from_pandas(base), k=8, min_count=2) \
        .to_pandas().sort_values("doc_id")
    assert out["text"].tolist() == [
        "nine ten", "different tail",
        "completely unrelated words here that do not repeat at all",
        "x y z"]


def test_dup_span_counts_overlapping_spans_union(ray_session):
    """Overlapping frequent grams in one doc must count the UNION of
    covered positions, not the sum (doc 0/1 share a 9-word prefix =>
    two overlapping 8-grams covering 9 positions, not 16)."""
    import ray.data

    from tokrle.functions.dupspan import dup_span_source_stats

    base = pd.DataFrame({
        "doc_id": [0, 1],
        "source": ["s", "s"],
        "text": ["a b c d e f g h i tail0 xx",
                 "a b c d e f g h i tail1 yy"],
    })
    df = dup_span_source_stats(ray.data.from_pandas(base), k=8, min_count=2)
    assert df["dup_words"].tolist() == [18]      # 9 per doc, unioned
    assert df["total_words"].tolist() == [22]


def test_dup_span_stats_matches_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as E

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    got = E.queries()["dup_span_stats"](sf)
    want = con.sql(E.oracle_sql()["dup_span_stats"]).df()
    cols = sorted(got.columns)
    assert got[cols].astype(str).sort_values(cols).reset_index(drop=True) \
        .equals(want[cols].astype(str).sort_values(cols).reset_index(drop=True))


def test_redact_default_pii_patterns(ray_session):
    import ray.data

    from tokrle.functions.redact import redact

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "contact alice.smith+x@example.co.uk or bob@test.org today",
            "call +1 (555) 123-4567 about server 192.168.001.200 now",
            "no sensitive content in this row at all",
            "",
        ],
    })
    out = redact(ray.data.from_pandas(df)).to_pandas().sort_values("doc_id")
    assert out["text"].tolist() == [
        "contact [REDACTED] or [REDACTED] today",
        "call [REDACTED] about server [REDACTED] now",
        "no sensitive content in this row at all",
        "",
    ]
    assert out["n_redactions"].tolist() == [2, 2, 0, 0]


def test_redact_invalid_pattern_raises():
    from tokrle.functions.redact import Redactor

    with pytest.raises(ValueError, match="not valid RE2"):
        Redactor({"bad": r"(unclosed"})


def test_redact_stats_matches_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as E

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    got = E.queries()["redact_stats"](sf)
    want = con.sql(E.oracle_sql()["redact_stats"]).df()
    cols = sorted(got.columns)
    assert got[cols].astype(str).sort_values(cols).reset_index(drop=True) \
        .equals(want[cols].astype(str).sort_values(cols).reset_index(drop=True))


def test_asof_join_semantics(ray_session):
    """Backward as-of: latest right ts <= left ts within the key; equal
    timestamps match; no prior right row -> nulls; keys never leak."""
    import ray.data

    from tokrle.functions.asof import asof_join

    left = ray.data.from_pandas(pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "user_id": [7, 7, 7, 9],
        "ts": pd.to_datetime(["2024-01-01 00:00:05",
                              "2024-01-01 00:00:10",
                              "2024-01-01 00:00:02",
                              "2024-01-01 00:00:30"]),
    }))
    right = ray.data.from_pandas(pd.DataFrame({
        "event_id": [100, 101, 102],
        "user_id": [7, 7, 8],
        "ts": pd.to_datetime(["2024-01-01 00:00:05",   # == left ts: matches
                              "2024-01-01 00:00:07",
                              "2024-01-01 00:00:01"]),  # other user
    }))
    out = asof_join(left, right, on="user_id", ts_col="ts",
                    right_cols=("event_id",)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert out["right_event_id"].tolist() == [100.0, 101.0, None, None] \
        or out["right_event_id"].astype("object").where(
            out["right_event_id"].notna(), None).tolist() == \
        [100, 101, None, None]


def test_asof_attribution_matches_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as E

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    got = E.queries()["asof_attribution_stats"](sf)
    want = con.sql(E.oracle_sql()["asof_attribution_stats"]).df()
    cols = sorted(got.columns)
    assert got[cols].astype("int64").reset_index(drop=True) \
        .equals(want[cols].astype("int64").reset_index(drop=True))


def test_range_join_pairs_exact(ray_session):
    """Enumerated pairs vs a brute-force double loop, incl. touching
    (non-overlapping) intervals and cross-key isolation."""
    import ray.data

    from tokrle.functions.rangejoin import range_join_pairs

    a = pd.DataFrame({"key": ["k1", "k1", "k2", "k3"],
                      "start": [0, 10, 0, 5],
                      "end": [5, 20, 3, 6],
                      "aid": [1, 2, 3, 4]})
    b = pd.DataFrame({"key": ["k1", "k1", "k2", "k1"],
                      "start": [4, 5, 100, 19],
                      "end": [12, 10, 200, 30],
                      "bid": [10, 11, 12, 13]})
    got = range_join_pairs(ray.data.from_pandas(a), ray.data.from_pandas(b),
                           key="key", a_id="aid", b_id="bid").to_pandas()
    want = set()
    for _, ra in a.iterrows():
        for _, rb in b.iterrows():
            if ra["key"] == rb["key"] and ra["start"] < rb["end"] \
                    and rb["start"] < ra["end"]:
                want.add((ra["aid"], rb["bid"],
                          min(ra["end"], rb["end"])
                          - max(ra["start"], rb["start"])))
    assert set(zip(got["aid"], got["bid"], got["overlap"])) == want
    # interval [0,5) does NOT overlap [5,10) (half-open, touching)
    assert (1, 11, 0) not in want


def test_range_overlap_stats_matches_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as E

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    got = E.queries()["range_overlap_stats"](sf)
    want = con.sql(E.oracle_sql()["range_overlap_stats"]).df()
    cols = sorted(got.columns)
    assert got[cols].astype("int64").sort_values(cols) \
        .reset_index(drop=True) \
        .equals(want[cols].astype("int64").sort_values(cols)
                .reset_index(drop=True))


def test_tfidf_top_terms_explicit(ray_session):
    """Known-score example incl. the term-ASC tie-break."""
    import ray.data

    from tokrle.functions.tfidf import (document_frequencies,
                                        top_tfidf_terms)

    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "source": ["s"] * 3,
        # "rare" appears in 1 doc (df=1); "common" in all 3 (df=3)
        "text": ["rare common common",          # rare: 1/1 > common: 2/3
                 "common common common",        # only common
                 "alpha beta common"],          # tie 1/1 vs 1/1 -> alpha
    })
    ds = ray.data.from_pandas(df)
    dft = document_frequencies(ds).set_index("w")["df"]
    assert dft["rare"] == 1 and dft["common"] == 3
    top = top_tfidf_terms(ds).to_pandas()
    assert sorted(top["top_term"]) == ["alpha", "common", "rare"]


def test_tfidf_stats_match_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as E

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    got = E.queries()["tfidf_top_terms_stats"](sf)
    want = con.sql(E.oracle_sql()["tfidf_top_terms_stats"]).df()
    cols = sorted(got.columns)
    assert got[cols].astype(str).sort_values(cols).reset_index(drop=True) \
        .equals(want[cols].astype(str).sort_values(cols)
                .reset_index(drop=True))


def test_stratified_sample_partitioning_invariant(ray_session):
    """Same row set regardless of block layout; exact quotas; keys with
    fewer rows than k keep everything."""
    import ray.data

    from tokrle.functions.sampling import stratified_sample

    df = pd.DataFrame({
        "doc_id": np.arange(100),
        "source": (["a"] * 60 + ["b"] * 37 + ["c"] * 3),
        "n_chars": np.arange(100) * 3,
    })
    k = 5
    got1 = stratified_sample(ray.data.from_pandas(df), k=k, seed=2) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    got8 = stratified_sample(ray.data.from_pandas(df).repartition(8),
                             k=k, seed=2) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got1.equals(got8)
    counts = got1.groupby("source").size()
    assert counts["a"] == k and counts["b"] == k and counts["c"] == 3
    # reference selection: k smallest hash ranks per source
    from tokrle.functions.sampling import sample_rank

    df["h"] = sample_rank(df["doc_id"].to_numpy(), 2)
    want = df.sort_values(["h", "doc_id"]).groupby("source").head(k)
    assert sorted(got1["doc_id"]) == sorted(want["doc_id"])


def test_stratified_sample_stats_matches_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as E

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    got = E.queries()["stratified_sample_stats"](sf)
    want = con.sql(E.oracle_sql()["stratified_sample_stats"]).df()
    cols = sorted(got.columns)
    assert got[cols].astype(str).sort_values(cols).reset_index(drop=True) \
        .equals(want[cols].astype(str).sort_values(cols)
                .reset_index(drop=True))


def test_kmeans_recovers_planted_clusters(ray_session):
    """Three well-separated planted clusters: every member lands with its
    own centroid, semdedup finds within-cluster planted dups only."""
    import ray.data

    from tokrle.functions.kmeans import (kmeans_assign, kmeans_fit,
                                         semdedup_pairs)

    rng = np.random.default_rng(5)
    centers = np.eye(3, 16) * 10
    vecs, labels = [], []
    for c in range(3):
        pts = centers[c] + rng.standard_normal((30, 16)) * 1.0
        vecs.extend(pts)
        labels.extend([c] * 30)
    # planted near-dup inside cluster 0: copy of vec 0 with id 900
    vecs.append(vecs[0] * 1.0001)
    labels.append(0)
    df = pd.DataFrame({"vec_id": np.arange(len(vecs)),
                       "embedding": [v.astype(np.float32) for v in vecs]})
    ds = ray.data.from_pandas(df)
    centroids = kmeans_fit(ds, k=3, iters=4, seed=1)
    assigned = kmeans_assign(ds, centroids).to_pandas() \
        .sort_values("vec_id")
    # same planted label <=> same cluster id (bijection check)
    got = assigned["cluster_id"].to_numpy()
    mapping = {}
    for lab, cid in zip(labels, got):
        assert mapping.setdefault(lab, cid) == cid
    assert len(set(mapping.values())) == 3
    # partitioning invariance
    assigned8 = kmeans_assign(ds.repartition(8), centroids).to_pandas() \
        .sort_values("vec_id")
    assert np.array_equal(got, assigned8["cluster_id"].to_numpy())
    pairs = semdedup_pairs(ds, centroids, threshold=0.999).to_pandas()
    assert {frozenset((int(a), int(b)))
            for a, b in zip(pairs["id_a"], pairs["id_b"])} == \
        {frozenset((0, 90))}


def test_epoch_shuffle_is_seeded_permutation(ray_session):
    import ray.data

    from tokrle.functions.shuffle import epoch_hash, shuffle_epoch

    ids = np.arange(500, dtype=np.int64) * 37 + 3
    df = pd.DataFrame({"doc_id": ids, "payload": ids * 2})
    ds = ray.data.from_pandas(df).repartition(7)

    out = shuffle_epoch(ds, seed=3).to_pandas()
    # a permutation: same multiset of rows, payload still attached to its id
    assert sorted(out["doc_id"]) == sorted(ids)
    assert (out["payload"].to_numpy() == out["doc_id"].to_numpy() * 2).all()
    # order matches the dense NumPy oracle (stable sort on (hash, id))
    h = epoch_hash(ids, 3)
    want = ids[np.lexsort((ids, h))]
    assert np.array_equal(out["doc_id"].to_numpy(), want)
    # partitioning-invariant: same order from a different block layout
    out2 = shuffle_epoch(ds.repartition(2), seed=3).to_pandas()
    assert np.array_equal(out2["doc_id"].to_numpy(), want)
    # a different seed is a genuinely different permutation (not a
    # rotation): substantial disagreement in every region of the order
    out5 = shuffle_epoch(ds, seed=5).to_pandas()["doc_id"].to_numpy()
    assert (out5 != out["doc_id"].to_numpy()).mean() > 0.9


def test_unigram_rarity_matches_dense_oracle(ray_session):
    import ray.data

    from tokrle.functions.lm import (RARITY_SCALE, score_nll, score_rarity,
                                     train_unigram_counts)

    rng = np.random.default_rng(4)
    docs = [rng.integers(0, 40, rng.integers(1, 30)).astype(np.int32)
            for _ in range(60)]
    docs[7] = np.empty(0, dtype=np.int32)     # empty doc mid-stream
    docs[-1] = np.empty(0, dtype=np.int32)    # empty doc at the tail
    import pyarrow as pa

    tbl = pa.table({
        "doc_id": pa.array([str(i) for i in range(len(docs))]),
        "tokens": pa.array([d.tolist() for d in docs],
                           type=pa.list_(pa.int32())),
        "n_tok": pa.array([len(d) for d in docs], type=pa.int32()),
        "source": pa.array(["s"] * len(docs)),
    })
    ds = ray.data.from_arrow(tbl).repartition(5)

    counts = train_unigram_counts(ds)
    flat = np.concatenate([d for d in docs if len(d)])
    want_counts = np.bincount(flat)
    assert np.array_equal(counts, want_counts)

    out = score_rarity(ds, counts).to_pandas().sort_values(
        "doc_id", key=lambda s: s.astype(int)).reset_index(drop=True)
    total = int(counts.sum())
    for i, d in enumerate(docs):
        want_sum = int(counts[d].sum()) if len(d) else 0
        assert out.loc[i, "sum_counts"] == want_sum, i
        want_rare = int(len(d) > 0
                        and RARITY_SCALE * want_sum < len(d) * total)
        assert out.loc[i, "is_rare"] == want_rare, i

    nll = score_nll(ds, counts).to_pandas().sort_values(
        "doc_id", key=lambda s: s.astype(int)).reset_index(drop=True)
    logp = np.log((counts + 0.5) / (counts.sum() + 0.5 * len(counts)))
    for i, d in enumerate(docs):
        want = -logp[d].mean() if len(d) else 0.0
        assert abs(nll.loc[i, "nll"] - want) < 1e-9, i


def test_split_sequences_matches_dense_oracle(ray_session):
    import pyarrow as pa
    import ray.data

    from tokrle.functions.chunking import split_sequences

    rng = np.random.default_rng(6)
    lens = [0, 1, 7, 8, 9, 16, 17, 25, 100, 3]   # around the window edges
    docs = [rng.integers(0, 1000, n).astype(np.int32) for n in lens]
    tbl = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(len(docs))]),
        "tokens": pa.array([d.tolist() for d in docs],
                           type=pa.list_(pa.int32())),
        "n_tok": pa.array(lens, type=pa.int32()),
        "source": pa.array(["s"] * len(docs)),
    })
    out = split_sequences(ray.data.from_arrow(tbl).repartition(3),
                          max_len=8, overlap=3).to_pandas()
    # dense python oracle
    want = []
    for i, d in enumerate(docs):
        start, ci = 0, 0
        while start < len(d):
            want.append((f"d{i}", ci, d[start:start + 8].tolist()))
            if start + 8 >= len(d):
                break
            start += 5
            ci += 1
    got = sorted(
        (r["doc_id"], r["chunk_idx"], list(r["tokens"]))
        for _, r in out.iterrows())
    assert got == sorted(want)
    # n_tok column matches each chunk's true length; source passed through
    assert (out["n_tok"] == out["tokens"].map(len)).all()
    assert (out["source"] == "s").all()


def test_top_k_by_score_partitioning_invariant(ray_session):
    """Exact best-k per key by score (ties on id), identical row set
    across block layouts, small keys keep everything."""
    import ray.data

    from tokrle.functions.sampling import top_k_by_score

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "doc_id": np.arange(200),
        "source": (["a"] * 120 + ["b"] * 77 + ["c"] * 3),
        "score": rng.integers(0, 50, 200),   # dense scores -> real ties
    })
    k = 6
    sel = dict(key="source", score_col="score", k=k, id_col="doc_id")
    got1 = top_k_by_score(ray.data.from_pandas(df), **sel) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    got8 = top_k_by_score(ray.data.from_pandas(df).repartition(8), **sel) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got1.equals(got8)
    counts = got1.groupby("source").size()
    assert counts["a"] == k and counts["b"] == k and counts["c"] == 3
    want = df.sort_values(["score", "doc_id"],
                          ascending=[False, True]).groupby("source").head(k)
    assert sorted(got1["doc_id"]) == sorted(want["doc_id"])
    # ascending variant: k smallest scores
    asc = top_k_by_score(ray.data.from_pandas(df), descending=False,
                         **sel).to_pandas()
    want_asc = df.sort_values(["score", "doc_id"]).groupby("source").head(k)
    assert sorted(asc["doc_id"]) == sorted(want_asc["doc_id"])


def test_curriculum_topk_stats_matches_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as E

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    got = E.queries()["curriculum_topk_stats"](sf)
    want = con.sql(E.oracle_sql()["curriculum_topk_stats"]).df()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    pd.testing.assert_frame_equal(
        got[cols].reset_index(drop=True).astype(str),
        want[cols].reset_index(drop=True).astype(str))


def test_token_remap_frequency_ranked_and_invertible(ray_session):
    """new_id must equal rank by (count desc, old id asc); apply+invert
    must be the identity; strict mode rejects out-of-vocab ids."""
    import pyarrow as pa
    import ray.data

    from tokrle.functions.vocab import (apply_token_remap,
                                        build_token_remap, invert_remap)

    docs = [[7, 7, 7, 3, 3, 100], [3, 7, 100, 100, 100, 100], [7]]
    tbl = pa.table({
        "doc_id": pa.array(["a", "b", "c"]),
        "tokens": pa.array(docs, type=pa.list_(pa.int32())),
    })
    ds = ray.data.from_arrow(tbl).repartition(2)
    old_of_new, new_of_old = build_token_remap(ds)
    # counts: 7 -> 5, 100 -> 5, 3 -> 3; tie between 7 and 100 -> old asc
    assert list(old_of_new) == [7, 100, 3]
    assert new_of_old[7] == 0 and new_of_old[100] == 1 and new_of_old[3] == 2

    remapped = apply_token_remap(ds, new_of_old)
    got = {r["doc_id"]: list(r["tokens"]) for r in remapped.take_all()}
    assert got["a"] == [0, 0, 0, 2, 2, 1]
    back = apply_token_remap(remapped, invert_remap(old_of_new))
    got_back = {r["doc_id"]: list(r["tokens"]) for r in back.take_all()}
    assert got_back == {"a": docs[0], "b": docs[1], "c": docs[2]}

    oov = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["x"]),
        "tokens": pa.array([[7, 999]], type=pa.list_(pa.int32())),
    }))
    with pytest.raises(Exception, match="vocabulary"):
        apply_token_remap(oov, new_of_old).take_all()


def test_dup_span_broadcast_and_join_paths_agree(ray_session):
    """The size-guarded broadcast path and the co-group join path must
    produce identical per-source stats (join path forced via
    max_index_rows=0)."""
    import ray.data

    from tokrle.functions.dupspan import dup_span_source_stats

    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(words, rng.integers(5, 40)))
             for _ in range(40)]
    texts += [texts[0], texts[1], texts[2] + " extra tail here"]
    base = pd.DataFrame({
        "doc_id": np.arange(len(texts)),
        "source": [f"s{i % 3}" for i in range(len(texts))],
        "text": texts,
    })
    ds = ray.data.from_pandas(base).repartition(4)
    a = dup_span_source_stats(ds, k=5, min_count=2)
    b = dup_span_source_stats(ds, k=5, min_count=2, max_index_rows=0)
    pd.testing.assert_frame_equal(a, b)
    assert a["dup_words"].sum() > 0          # the corpus has real dups


def test_rollup_aggregate_matches_pandas(ray_session):
    """rollup_aggregate == pandas groupby at every level, partitioning-
    invariant, with the 'ALL' sentinel on rolled-up keys."""
    import ray

    from tokrle.functions.rollup import rollup_aggregate, with_ones

    rng = np.random.default_rng(23)
    n = 5000
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], n),
        "b": rng.choice(["p", "q"], n),
        "v": rng.integers(-100, 100, n).astype("int64"),
    })
    want_rows = []
    g2 = df.groupby(["a", "b"], as_index=False).agg(
        n=("v", "size"), sum_v=("v", "sum"))
    want_rows.append(g2)
    g1 = df.groupby(["a"], as_index=False).agg(
        n=("v", "size"), sum_v=("v", "sum"))
    g1["b"] = "ALL"
    want_rows.append(g1[["a", "b", "n", "sum_v"]])
    want_rows.append(pd.DataFrame({"a": ["ALL"], "b": ["ALL"],
                                   "n": [n], "sum_v": [df["v"].sum()]}))
    want = pd.concat(want_rows, ignore_index=True).astype(
        {"n": "int64", "sum_v": "int64"})
    want = want.sort_values(["a", "b", "n", "sum_v"]).reset_index(drop=True)
    for parts in (1, 7):
        ds = with_ones(ray.data.from_pandas(df).repartition(parts))
        got = rollup_aggregate(ds, ["a", "b"], ["v"])
        assert got.equals(want), parts


def test_rollup_sentinel_collision_rejected(ray_session):
    """A key value equal to the sentinel would silently merge with the
    rolled-up rows; non-string keys would produce mixed-type columns.
    Both must raise — and a custom sentinel sidesteps the collision
    (r3 advisor finding)."""
    import pytest
    import ray

    from tokrle.functions.rollup import rollup_aggregate, with_ones

    df = pd.DataFrame({"a": ["x", "ALL", "y"], "b": ["p", "q", "p"],
                       "v": [1, 2, 3]})
    ds = with_ones(ray.data.from_pandas(df))
    with pytest.raises(ValueError, match="sentinel"):
        rollup_aggregate(ds, ["a", "b"], ["v"])
    got = rollup_aggregate(ds, ["a", "b"], ["v"], sentinel="<all>")
    assert (got["a"] == "<all>").sum() == 1 + 0  # grand total row only
    assert int(got.loc[(got["a"] == "<all>"), "sum_v"].iloc[0]) == 6

    bad = pd.DataFrame({"a": [1, 2], "b": ["p", "q"], "v": [1, 2]})
    with pytest.raises(TypeError, match="string-typed"):
        rollup_aggregate(with_ones(ray.data.from_pandas(bad)),
                         ["a", "b"], ["v"])


def test_cube_aggregate_matches_pandas(ray_session):
    """cube_aggregate == pandas groupby at every subset of the keys
    (including the (b)-only set ROLLUP cannot produce), partitioning-
    invariant; grouping_sets rejects non-derivable sets."""
    import pytest
    import ray

    from tokrle.functions.rollup import (cube_aggregate,
                                         grouping_sets_aggregate, with_ones)

    rng = np.random.default_rng(29)
    n = 4000
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], n),
        "b": rng.choice(["p", "q"], n),
        "v": rng.integers(-100, 100, n).astype("int64"),
    })
    want_rows = []
    for s in (["a", "b"], ["a"], ["b"], []):
        if s:
            g = df.groupby(s, as_index=False).agg(
                n=("v", "size"), sum_v=("v", "sum"))
        else:
            g = pd.DataFrame({"n": [n], "sum_v": [df["v"].sum()]})
        for k in ("a", "b"):
            if k not in s:
                g[k] = "ALL"
        want_rows.append(g[["a", "b", "n", "sum_v"]])
    want = pd.concat(want_rows, ignore_index=True).astype(
        {"n": "int64", "sum_v": "int64"})
    want = want.sort_values(["a", "b", "n", "sum_v"]).reset_index(drop=True)
    for parts in (1, 7):
        ds = with_ones(ray.data.from_pandas(df).repartition(parts))
        got = cube_aggregate(ds, ["a", "b"], ["v"])
        assert got.equals(want), parts
    ds = with_ones(ray.data.from_pandas(df))
    with pytest.raises(ValueError):
        grouping_sets_aggregate(ds, ["a", "b"], [["c"]], ["v"])


def test_add_window_columns_matches_pandas(ray_session):
    """row_number / running sum / lag gap vs a pandas groupby-apply
    oracle, partitioning-invariant, ties broken by the trailing order
    column."""
    import ray

    from tokrle.functions.window_fns import LAG_NULL, add_window_columns

    rng = np.random.default_rng(31)
    n = 3000
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n).astype("int64"),
        "t": rng.integers(0, 50, n).astype("int64"),   # heavy ties
        "uid": np.arange(n, dtype="int64"),
        "v": rng.integers(-50, 50, n).astype("int64"),
    })
    s = df.sort_values(["k", "t", "uid"]).reset_index(drop=True)
    g = s.groupby("k")
    s["rn"] = g.cumcount() + 1
    s["run_value"] = g["v"].cumsum()
    s["lag_gap"] = s["t"] - g["t"].shift(1)
    s["lag_gap"] = s["lag_gap"].fillna(float(LAG_NULL)).astype("int64")
    want = s.sort_values("uid").reset_index(drop=True)
    for parts in (1, 6):
        ds = ray.data.from_pandas(df).repartition(parts)
        got = add_window_columns(ds, "k", ["t", "uid"], "v") \
            .to_pandas().sort_values("uid").reset_index(drop=True)
        for c in ("rn", "run_value", "lag_gap"):
            assert got[c].equals(want[c]), (parts, c)


def test_skew_join_both_paths_match_pandas(ray_session):
    """skew_join == pandas merge on a 40%-one-key skewed input through
    BOTH hot mechanisms (broadcast map-join, salted replicate join) and
    the no-hot-keys native fallback."""
    import ray

    from tokrle.functions.skewjoin import skew_join

    rng = np.random.default_rng(3)
    n = 8000
    keys = rng.integers(0, 300, n).astype("int64")
    keys[rng.random(n) < 0.4] = 7
    left = pd.DataFrame({"k": keys,
                         "lv": rng.integers(0, 100, n).astype("int64")})
    right = pd.DataFrame({"rk": np.arange(300, dtype="int64"),
                          "rv": rng.integers(0, 100, 300).astype("int64")})
    want = left.merge(right, left_on="k", right_on="rk") \
        .drop(columns=["rk"]).sort_values(["k", "lv", "rv"]) \
        .reset_index(drop=True)
    lds = ray.data.from_pandas(left).repartition(6)
    rds = ray.data.from_pandas(right).repartition(3)
    for path in ("broadcast", "salted"):
        got = skew_join(lds, rds, left_key="k", right_key="rk",
                        hot_threshold=1000, stride=8, force_path=path) \
            .to_pandas().sort_values(["k", "lv", "rv"]) \
            .reset_index(drop=True)
        assert got[["k", "lv", "rv"]].equals(want[["k", "lv", "rv"]]), path
    # threshold nothing reaches -> pure native join, still exact
    got = skew_join(lds, rds, left_key="k", right_key="rk",
                    hot_threshold=10**9).to_pandas() \
        .sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    assert got[["k", "lv", "rv"]].equals(want[["k", "lv", "rv"]])
    # hot keys with NO right-side match must drop cleanly (inner join)
    right2 = right[right["rk"] != 7].reset_index(drop=True)
    want2 = left.merge(right2, left_on="k", right_on="rk") \
        .drop(columns=["rk"]).sort_values(["k", "lv", "rv"]) \
        .reset_index(drop=True)
    got2 = skew_join(lds, ray.data.from_pandas(right2).repartition(3),
                     left_key="k", right_key="rk", hot_threshold=1000,
                     stride=8, force_path="broadcast").to_pandas() \
        .sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    assert got2[["k", "lv", "rv"]].equals(want2[["k", "lv", "rv"]])


def test_group_mean_filter_matches_pandas(ray_session):
    import ray

    from tokrle.functions.normalize import group_mean_filter

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], 2000),
        "v": rng.integers(0, 1000, 2000).astype("int64"),
    })
    mean = df.groupby("g")["v"].transform("mean")
    want_above = df[df["v"] > mean].sort_values(["g", "v"]) \
        .reset_index(drop=True)
    want_below = df[df["v"] <= mean].sort_values(["g", "v"]) \
        .reset_index(drop=True)
    ds = ray.data.from_pandas(df).repartition(4)
    got_a = group_mean_filter(ds, "g", "v").to_pandas() \
        .sort_values(["g", "v"]).reset_index(drop=True)
    got_b = group_mean_filter(ds, "g", "v", above=False).to_pandas() \
        .sort_values(["g", "v"]).reset_index(drop=True)
    assert got_a.equals(want_above)
    assert got_b.equals(want_below)
    assert len(got_a) + len(got_b) == len(df)


def test_pq_encode_decode_exact_on_codebook_points():
    """Vectors sitting exactly on codebook centroids reconstruct exactly
    (per subspace), and codes pick the lowest index on ties."""
    from tokrle.functions.pq import _encode_matrix, pq_decode_codes

    rng = np.random.default_rng(3)
    m, k, dsub = 4, 8, 4
    books = rng.standard_normal((m, k, dsub))
    picks = rng.integers(0, k, size=(20, m))
    vecs = np.concatenate([books[j][picks[:, j]] for j in range(m)], axis=1)
    codes = _encode_matrix(vecs, books)
    assert np.array_equal(codes, picks.astype(np.uint8))
    rec = pq_decode_codes(codes, books)
    assert np.allclose(rec, vecs)


def test_pq_ann_finds_planted_dups(ray_session):
    """PQ codes + asymmetric-distance top-k: planted near-duplicates are
    each query's distinctly-closest neighbour and PQ must surface them
    top-1; recall@5 overlaps exact brute force; codes are
    partitioning-invariant; the encoded column is 16x smaller.  (Exact
    top-1 agreement WITHIN a tight cluster is not asserted — resolving
    ties finer than the quantization cell is not what PQ promises.)"""
    import ray.data

    from tokrle.functions.ann import brute_force_topk
    from tokrle.functions.pq import pq_encode, pq_topk, pq_train

    rng = np.random.default_rng(9)
    n_clusters, per, dim = 5, 40, 32
    centers = rng.standard_normal((n_clusters, dim)) * 8
    vecs = np.concatenate([
        centers[c] + rng.standard_normal((per, dim)) * 2.0
        for c in range(n_clusters)])
    q_idx = np.arange(0, len(vecs), 10)
    dups = vecs[q_idx] * 1.0005          # planted near-dup per query
    allv = np.concatenate([vecs, dups])
    dup_ids = np.arange(len(vecs), len(allv))
    df = pd.DataFrame({"vec_id": np.arange(len(allv)),
                       "embedding": [v.astype(np.float32) for v in allv]})
    ds = ray.data.from_pandas(df)

    books = pq_train(ds, m=8, k=64, iters=6, sample_size=256, seed=2)
    assert books.shape == (8, 64, 4)
    code_ds = pq_encode(ds, books)
    codes = code_ds.to_pandas().sort_values("vec_id")
    assert all(len(c) == 8 for c in codes["codes"])  # 8 B vs 128 B raw

    # partitioning invariance of the encode
    codes8 = pq_encode(ds.repartition(8), books).to_pandas() \
        .sort_values("vec_id")
    assert [list(a) for a in codes["codes"]] == \
        [list(a) for a in codes8["codes"]]

    queries = allv[q_idx]
    res = pq_topk(code_ds, queries, q_idx, books, k=5)
    top1 = res[res["rank"] == 1].sort_values("q_id")
    assert len(top1) == len(q_idx)
    hit = (top1["vec_id"].to_numpy() == dup_ids).mean()
    assert hit >= 0.9, hit
    # recall@5 overlap with exact brute force
    exact = brute_force_topk(ds, queries, q_idx, k=5)
    ex = exact.groupby("q_id")["vec_id"].agg(set)
    ap = res.groupby("q_id")["vec_id"].agg(set)
    overlap = np.mean([len(ex[q] & ap[q]) / 5 for q in ex.index])
    assert overlap >= 0.4, overlap


def test_pq_codes_deterministic_and_reconstruction_bound():
    """Hypothesis-style sweep without Ray: codes are a pure function of
    (vectors, codebooks); reconstruction error never exceeds the worst
    per-subspace quantization radius; codes stay in range."""
    from tokrle.functions.pq import (_encode_matrix, _subspace_kmeans,
                                     pq_decode_codes)

    rng = np.random.default_rng(17)
    for trial in range(5):
        n, m, k, dsub = 300, 4, 16, 3
        x = rng.standard_normal((n, m * dsub)) * (trial + 1)
        books = np.empty((m, k, dsub))
        for j in range(m):
            books[j] = _subspace_kmeans(x[:, j * dsub:(j + 1) * dsub],
                                        k, 5, np.random.default_rng(trial))
        c1 = _encode_matrix(x, books)
        c2 = _encode_matrix(x.copy(), books.copy())
        assert np.array_equal(c1, c2)
        assert c1.max() < k
        rec = pq_decode_codes(c1, books)
        # each subspace's assigned centroid is the NEAREST one
        for j in range(m):
            xs = x[:, j * dsub:(j + 1) * dsub]
            d_all = ((xs[:, None, :] - books[j][None]) ** 2).sum(-1)
            assert np.allclose(d_all[np.arange(n), c1[:, j]],
                               d_all.min(axis=1))
        assert ((rec - x) ** 2).sum(1).max() <= \
            sum(((x[:, j * dsub:(j + 1) * dsub][:, None, :]
                  - books[j][None]) ** 2).sum(-1).min(1).max()
                for j in range(m)) + 1e-9


def test_skew_sampling_eviction_keeps_hot_keys(ray_session, monkeypatch):
    """Space-saving eviction in _sample_key_counts must keep the genuinely
    hot keys even when the driver accumulator is forced far below the key
    cardinality (the scale scenario the capacity bound exists for)."""
    import numpy as np
    import pandas as pd
    import ray.data

    import tokrle.functions.skewjoin as sj

    monkeypatch.setattr(sj, "SAMPLE_CAPACITY", 64)
    monkeypatch.setattr(sj, "SAMPLE_BLOCK_TOPK", 32)
    rng = np.random.default_rng(17)
    # 2000 unique cold keys (1-2 rows each) + two hot keys with 500 rows
    cold = rng.integers(10_000, 100_000, 3000)
    hot = np.concatenate([np.full(500, 7), np.full(500, 11)])
    keys = np.concatenate([cold, hot])
    rng.shuffle(keys)
    ds = ray.data.from_pandas(pd.DataFrame({"k": keys})).repartition(8)
    found = sj.sample_hot_keys(ds, "k", threshold=100, stride=2)
    assert 7 in found and 11 in found
    # no cold key can reach the threshold even with stride scaling
    assert all(k in (7, 11) for k in found)


def test_remove_dup_spans_join_path_byte_identical(ray_session):
    """Forcing the join path (max_index_rows=0) must produce
    byte-identical rewritten text to the broadcast path on the planted
    fixtures AND a fuzzed corpus (r4 verdict item 3)."""
    import ray.data

    from tokrle.functions.dupspan import remove_dup_spans

    planted = pd.DataFrame({
        "doc_id": np.arange(4),
        "source": ["a", "a", "b", "b"],
        "text": [
            "one two three four five six seven eight nine ten",
            "one two three four five six seven eight different tail",
            "completely unrelated words here that do not repeat at all",
            "x y z",
        ],
    })
    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in range(25)]
    texts = [" ".join(rng.choice(words, rng.integers(5, 40)))
             for _ in range(30)]
    texts += [texts[0], texts[1], texts[2] + " more tail"]
    fuzzed = pd.DataFrame({
        "doc_id": np.arange(100, 100 + len(texts)),
        "source": [f"s{i % 3}" for i in range(len(texts))],
        "text": texts,
    })
    for base, k in ((planted, 8), (fuzzed, 5)):
        ds = ray.data.from_pandas(base).repartition(3)
        bc = remove_dup_spans(ds, k=k, min_count=2) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        jn = remove_dup_spans(ds, k=k, min_count=2, max_index_rows=0) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            bc[["doc_id", "source", "text"]],
            jn[["doc_id", "source", "text"]])
    # the planted fixture's expected rewrite, through the join path
    assert jn is not None


def test_semi_anti_join_null_keys_never_match(ray_session):
    """SQL null semantics: a NULL key never matches — semi drops it,
    anti keeps it — even when the key side also contains nulls."""
    import pyarrow as pa
    import ray.data

    from tokrle.functions.dedup import anti_join, semi_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array(["a", None, "b", None]),
        "v": pa.array([1, 2, 3, 4]),
    }))
    keys = ray.data.from_arrow(pa.table({
        "k": pa.array(["a", None]),
    }))
    semi = semi_join(left, keys, on="k").to_pandas()
    assert sorted(semi["v"]) == [1]
    anti = anti_join(left, keys, on="k").to_pandas()
    assert sorted(anti["v"]) == [2, 3, 4]


def test_hash_sample_near_full_band(ray_session):
    """n < total <= 1.5n used to overflow uint64 at frac == 1.0."""
    import pyarrow as pa
    import ray.data

    from tokrle.functions.ann import hash_sample

    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(5000), type=pa.int64())}))
    out = hash_sample(ds, "vec_id", 4096)
    assert len(out) == 4096
    assert out["vec_id"].is_unique


def test_audio_window_sums_string_ids(ray_session):
    """The exact-sum stages must accept the module's blessed media
    schema (string item ids), not just the bespoke int-id tables."""
    from tokrle.functions.multimodal import (AudioWindowSums,
                                             synth_media_table)

    media = synth_media_table(6, kind="audio", seed=3)
    out = media.map_batches(AudioWindowSums, batch_size=4,
                            batch_format="pyarrow",
                            concurrency=(1, 2)).to_pandas()
    assert out["item_id"].dtype == object
    assert len(out) == 6 * 4


def test_training_examples_doc_ids_unique_across_sources(ray_session,
                                                         tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tokrle.pipelines.prep import training_examples

    docs = pa.table({
        "doc_id": pa.array(range(1, 41), type=pa.int64()),
        "source": pa.array((["sA"] * 20) + (["sB"] * 20)),
        # token id = first-char ascii + word length: vary BOTH so the
        # Gopher repetition rule passes
        "text": pa.array([" ".join(chr(97 + (i + j) % 26) + "y" * (j % 7)
                                   for j in range(30))
                          for i in range(40)]),
    })
    path = str(tmp_path / "docs.parquet")
    pq.write_table(docs, path)
    out = training_examples(path, seq_len=64, min_words=1,
                            eval_mask=None).to_pandas()
    assert out["doc_id"].is_unique
    assert {d.split("#")[0] for d in out["doc_id"]} == {"sA", "sB"}
