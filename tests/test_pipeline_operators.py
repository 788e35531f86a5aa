"""Quality tests for the scale-path operators: LSH recall vs brute force,
near-dup detection on planted duplicates, multimodal batch plumbing, and
batch==streaming equivalence for the windowed aggregation."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from incubator_xtable_spark.operators.ann import ann_lsh_topk
from incubator_xtable_spark.operators.dedup import (
    minhash_near_duplicates,
    simhash_near_duplicates,
)
from incubator_xtable_spark.operators.multimodal import (
    decode_media,
    documents_as_media,
    fake_feature_extract,
)
from incubator_xtable_spark.plans.vector_queries import ann_bruteforce_topk
from incubator_xtable_spark.sources.tables import load

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    """Documents + planted near-duplicates: copies of some docs with one
    token appended (high Jaccard, not exact)."""
    docs = load(spark, SF_SMOKE, "documents")
    near = (
        docs.filter(F.col("doc_id") < 5)
        .select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extraword")).alias("text"),
            "lang",
            "source",
            (F.col("n_chars") + 10).alias("n_chars"),
        )
    )
    exact = docs.filter((F.col("doc_id") >= 5) & (F.col("doc_id") < 8)).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    return docs.unionByName(near).unionByName(exact)


def test_minhash_finds_planted_dups(spark, docs_with_dups):
    pairs = minhash_near_duplicates(docs_with_dups, threshold=0.5).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    # exact copies MUST be found (jaccard 1.0 -> every band matches)
    for d in range(5, 8):
        assert (d, d + 200000) in found, f"exact dup {d} missed"
    # planted near-dups: high jaccard, should mostly be caught
    near_hits = sum(1 for d in range(5) if (d, d + 100000) in found)
    assert near_hits >= 3, f"only {near_hits}/5 near-dups found"
    # jaccard values are sane
    for r in pairs:
        assert 0.5 <= r["jaccard"] <= 1.0


def test_simhash_finds_exact_dups(spark, docs_with_dups):
    pairs = simhash_near_duplicates(docs_with_dups, max_hamming=4).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    for d in range(5, 8):
        assert (d, d + 200000) in found, f"exact dup {d} missed by simhash"
    assert all(r["hamming"] == 0 for r in pairs if (r["doc_a"], r["doc_b"]) in {(d, d + 200000) for d in range(5, 8)})


def test_ann_lsh_recall_vs_bruteforce(spark):
    brute = ann_bruteforce_topk(spark, SF_SMOKE).collect()
    truth = {(r["q_id"], r["c_id"]) for r in brute}
    emb = load(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    approx = ann_lsh_topk(emb, queries, k=5).collect()
    got = {(r["q_id"], r["c_id"]) for r in approx}
    recall = len(truth & got) / len(truth)
    # random gaussian embeddings are a worst case for LSH; just require
    # meaningfully-better-than-chance behavior and correct mechanics
    assert recall > 0.1, f"LSH recall {recall:.2f} at chance level"
    # top-1 within each bucket must be a true cosine ordering
    assert all(r["rank"] >= 1 and r["rank"] <= 5 for r in approx)


def test_multimodal_fake_features_shape(spark):
    docs = load(spark, SF_SMOKE, "documents").limit(50)
    media = documents_as_media(docs)
    feats = fake_feature_extract(media, n_features=8).collect()
    assert len(feats) == 50
    for r in feats:
        assert r["n_bytes"] > 0
        assert len(r["features"]) == 8
        assert all(0.0 <= f <= 255.0 for f in r["features"])


def test_multimodal_decode_strict_raises_naming_the_row(spark):
    # documents_as_media wraps raw UTF-8 text — NOT a recognizable container;
    # strict decode must fail at execution naming the offending media_id
    docs = load(spark, SF_SMOKE, "documents").limit(1)
    media = documents_as_media(docs)
    decoded = decode_media(media, strict=True)  # plan-time OK
    # limit(1) doesn't pin WHICH row survives — assert any media_id is named
    with pytest.raises(Exception, match="media_id="):
        decoded.collect()


def test_multimodal_decode_quarantine_reports_errors(spark):
    docs = load(spark, SF_SMOKE, "documents").limit(5)
    media = documents_as_media(docs)
    rows = decode_media(media, strict=False).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["mime"] is None
        assert r["error"] is not None and "unrecognized" in r["error"]
        assert r["n_bytes"] > 0


def test_streaming_matches_batch_windowed_counts(spark, tmp_path):
    from incubator_xtable_spark.streaming.pipeline import (
        events_stream,
        run_available_now,
        windowed_event_counts,
    )

    # the file stream source requires a directory (it watches for new
    # files); stage the events file into one
    stream_dir = tmp_path / "events_in"
    stream_dir.mkdir()
    os.symlink(f"{SF_SMOKE}/events.parquet", stream_dir / "events.parquet")
    stream = events_stream(spark, str(stream_dir))
    agg = windowed_event_counts(stream)
    run_available_now(agg, "stream_counts", str(tmp_path / "ckpt"))
    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.table("stream_counts").collect()
    }

    batch_events = load(spark, SF_SMOKE, "events")
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in batch_events.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(38,6)")
            .cast("double")
            .alias("total_value"),
        )
        .collect()
    }
    assert streamed == batch


def test_streaming_sync_foreachbatch(spark, tmp_path):
    """Structured-Streaming sync hook: each micro-batch of arriving files
    triggers a metadata sync; the Delta log tracks the stream."""
    from pyspark.sql import functions as F

    from incubator_xtable_spark.model.core import TableFormat
    from incubator_xtable_spark.sources.delta_source import (
        list_log_versions,
        read_delta_as_df,
    )
    from incubator_xtable_spark.sources.parquet_source import ParquetConversionSource
    from incubator_xtable_spark.streaming.pipeline import streaming_sync
    from incubator_xtable_spark.sync.controller import ConversionController
    from incubator_xtable_spark.targets.delta_target import DeltaConversionTarget

    d = str(tmp_path / "stream_table")
    base = spark.read.parquet(f"{SF_SMOKE}/region.parquet")
    base.coalesce(1).write.parquet(d)

    source = ParquetConversionSource(spark, d, name="region")
    targets = {TableFormat.DELTA: DeltaConversionTarget(spark, d)}
    controller = ConversionController()

    q = streaming_sync(
        spark,
        controller,
        source,
        targets,
        watch_dir=d,
        schema=base.schema,
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    assert list_log_versions(d) == [0]
    assert read_delta_as_df(spark, d).count() == 5

    # new files arrive; a second availableNow pass syncs incrementally
    base.withColumn("r_regionkey", F.col("r_regionkey") + 10).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    q2 = streaming_sync(
        spark,
        controller,
        source,
        targets,
        watch_dir=d,
        schema=base.schema,
        checkpoint=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination()
    assert max(list_log_versions(d)) >= 1
    assert read_delta_as_df(spark, d).count() == 10


def test_events_stream_starts_on_empty_dir(spark, tmp_path):
    """The file-source stream must start before the first file lands
    (schema probe falls back to the nanos-as-long flavor)."""
    from incubator_xtable_spark.streaming.pipeline import events_stream

    empty = tmp_path / "empty_ingest"
    empty.mkdir()
    stream = events_stream(spark, str(empty))
    assert stream.isStreaming
    assert "ts" in stream.columns


def test_ann_ivf_recall_vs_bruteforce(spark):
    from incubator_xtable_spark.operators.ann import ann_ivf_topk

    brute = ann_bruteforce_topk(spark, SF_SMOKE).collect()
    truth = {(r["q_id"], r["c_id"]) for r in brute}
    emb = load(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    approx = ann_ivf_topk(emb, queries, k=5, n_centroids=16, n_probe=3).collect()
    got = {(r["q_id"], r["c_id"]) for r in approx}
    recall = len(truth & got) / len(truth)
    # gaussian embeddings cluster weakly; require clearly-above-chance
    # recall at ~3/16 probe fraction plus correct mechanics
    assert recall > 0.2, f"IVF recall {recall:.2f} at chance level"
    assert all(1 <= r["rank"] <= 5 for r in approx)
    # probing MORE cells must not lose pairs (monotone recall)
    wide = ann_ivf_topk(emb, queries, k=5, n_centroids=16, n_probe=16).collect()
    got_wide = {(r["q_id"], r["c_id"]) for r in wide}
    full_recall = len(truth & got_wide) / len(truth)
    assert full_recall >= recall
    # n_probe = n_centroids probes everything -> recall 1.0 (exact)
    assert full_recall == 1.0


# -- connected components (r10) ------------------------------------------------


def _cc(spark, pairs, **kw):
    from incubator_xtable_spark.operators.dedup import connected_components

    df = spark.createDataFrame(pairs, "src LONG, dst LONG")
    out = connected_components(df, **kw)
    return {r["node"]: r["cluster_id"] for r in out.collect()}


def test_connected_components_chain_star_and_islands(spark):
    # chain 1-2-3-4 (transitivity across never-scored pairs), star 10,
    # pair island 20-21
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (20, 21)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_long_chain_converges(spark):
    # a 24-node path needs ~diameter rounds; must converge, not truncate
    # (threshold=0 forces the DISTRIBUTED loop past the small-graph path)
    pairs = [(i, i + 1) for i in range(24)]
    got = _cc(spark, pairs, small_graph_threshold=0)
    assert set(got.values()) == {0} and len(got) == 25


def test_connected_components_small_graph_fast_path_matches_loop(spark):
    """The bounded driver union-find (auto default for small edge sets)
    must agree exactly with the distributed hash-min loop, including
    self-loop-only nodes and min-id representatives."""
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (20, 21), (5, 5), (7, 6)]
    fast = _cc(spark, pairs)  # default threshold takes the union-find path
    loop = _cc(spark, pairs, small_graph_threshold=0)
    assert fast == loop
    assert fast[7] == 6 and fast[5] == 5


def test_connected_components_raises_past_iteration_bound(spark):
    import pytest as _pytest

    pairs = [(i, i + 1) for i in range(12)]
    with _pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, pairs, max_iterations=2, algorithm="hashmin")


def test_connected_components_auto_switches_past_bound(spark):
    """algorithm='auto' must no longer refuse a past-the-bound diameter —
    it switches to two-phase and still produces the exact component
    minima (threshold=0 forces the distributed loop so the switch is
    actually exercised)."""
    pairs = [(i, i + 1) for i in range(12)]
    got = _cc(spark, pairs, max_iterations=2, small_graph_threshold=0)
    assert set(got.values()) == {0} and len(got) == 13


def test_two_phase_components_matches_hashmin_on_mixed_graph(spark):
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (20, 21), (5, 5)]
    a = _cc(spark, pairs, algorithm="twophase")
    b = _cc(spark, pairs, algorithm="hashmin")
    assert a == b
    assert _cc(spark, [], algorithm="twophase") == {}


def test_two_phase_components_long_path_converges_in_log_rounds(spark):
    """VERDICT r10 #4 done-criterion: a 10k-node PATH graph (diameter
    10k — hash-min would need 10k rounds) converges through the
    two-phase star contraction without raising, in O(log n) rounds
    (bounded by the operator's max_rounds=40 << 10k), to the exact
    single-component answer."""
    from incubator_xtable_spark.operators.dedup import connected_components

    n = 10_000
    edges = spark.range(n - 1).selectExpr("id AS src", "id + 1 AS dst")
    out = connected_components(edges, algorithm="twophase")
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("cluster_id").alias("k"),
        F.min("cluster_id").alias("mn"),
        F.max("cluster_id").alias("mx"),
    ).collect()[0]
    assert (agg["n"], agg["k"], agg["mn"], agg["mx"]) == (n, 1, 0, 0)


def test_connected_components_empty_edges(spark):
    got = _cc(spark, [])
    assert got == {}


def test_fuzzy_dedup_keep_decisions_transitive_and_keeper(spark):
    """Planted transitive near-dups: A~B and B~C pass the Jaccard gate
    (A~C may never be scored) — the pipeline must put all three in ONE
    cluster, keep exactly the min id, and leave the unrelated doc out."""
    from incubator_xtable_spark.operators.dedup import fuzzy_dedup_keep_decisions

    base = "the quick brown fox jumps over the lazy dog again and again today"
    words = base.split()
    # B shares most of A; C shares most of B but less of A
    a = " ".join(words)
    b = " ".join(words[:-1] + ["tonight"])
    c = " ".join(["well"] + words[:-1])
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c), (99, "completely unrelated text about spark engines")],
        "doc_id LONG, text STRING",
    )
    out = fuzzy_dedup_keep_decisions(docs, threshold=0.3).collect()
    got = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in out}
    assert 99 not in got, "doc with no near-dup must not appear"
    assert set(got) == {1, 2, 3}
    assert {cid for cid, _ in got.values()} == {1}, got
    assert got[1][1] is True and got[2][1] is False and got[3][1] is False
    # corpus filter shape: anti-join drops exactly the non-keepers
    from pyspark.sql import functions as F

    drops = spark.createDataFrame(
        [(k,) for k, (_, keep) in got.items() if not keep], "doc_id LONG"
    )
    kept = docs.join(drops, "doc_id", "left_anti")
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 99]


def test_quantized_topk_recall_vs_exact_dot(spark):
    """Int8 quantization quality gate: top-5 by quantized integer dot
    product overlaps the exact double dot-product top-5 (mean recall
    >= 0.7 measured 0.80 at this SF; the parity suite separately pins
    bit-exact agreement with the DuckDB oracle)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from incubator_xtable_spark.plans.registry import REGISTRY, _load_all
    from incubator_xtable_spark.plans.vector_queries import dot
    from incubator_xtable_spark.plans.common import t as load

    _load_all()
    sf = "/root/testdata/sf0.001"
    quant = REGISTRY["vector_quantized_topk"].fn(spark, sf).collect()
    emb = load(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qa")
    )
    c = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("qb"))
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("c_id"))
    exact = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("c_id"))
        .withColumn("score", dot(F.col("qa"), F.col("qb")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("q_id", "c_id")
        .collect()
    )
    from collections import defaultdict

    top_q, top_e = defaultdict(set), defaultdict(set)
    for r in quant:
        top_q[r["q_id"]].add(r["c_id"])
    for r in exact:
        top_e[r["q_id"]].add(r["c_id"])
    recalls = [len(top_q[k] & top_e[k]) / 5 for k in top_e]
    assert len(recalls) == 8
    assert sum(recalls) / len(recalls) >= 0.7, recalls
    assert min(recalls) >= 0.4, recalls


def test_ann_pq_recall_vs_bruteforce(spark):
    """PQ quality gates: (a) ADC shortlist + exact rerank recalls clearly
    above chance vs the brute-force cosine truth; (b) widening the
    shortlist (refine) never loses pairs; (c) a shortlist covering the
    whole corpus is exact (recall 1.0 — the rerank is exact cosine)."""
    from incubator_xtable_spark.operators.ann import ann_pq_topk

    brute = ann_bruteforce_topk(spark, SF_SMOKE).collect()
    truth = {(r["q_id"], r["c_id"]) for r in brute}
    emb = load(spark, SF_SMOKE, "embeddings")
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < 8)
    approx = ann_pq_topk(emb, queries, dim=64, k=5, m=8, n_codes=16, refine=4).collect()
    got = {(r["q_id"], r["c_id"]) for r in approx}
    recall = len(truth & got) / len(truth)
    # 64-dim gaussian embeddings are a hard (unclustered) PQ case; the
    # gate is clearly-above-chance recall + correct mechanics (chance at
    # shortlist 20 of ~100 candidates followed by exact rerank ~ 0.2)
    assert recall > 0.35, f"PQ recall {recall:.2f} at chance level"
    assert all(1 <= r["rank"] <= 5 for r in approx)
    wide = ann_pq_topk(emb, queries, dim=64, k=5, m=8, n_codes=16, refine=8).collect()
    got_wide = {(r["q_id"], r["c_id"]) for r in wide}
    assert len(truth & got_wide) >= len(truth & got)
    full = ann_pq_topk(
        emb, queries, dim=64, k=5, m=8, n_codes=16, refine=(n // 5) + 1
    ).collect()
    got_full = {(r["q_id"], r["c_id"]) for r in full}
    assert len(truth & got_full) / len(truth) == 1.0


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join == its batch twin under
    availableNow (same assertion style as the windowed-counts test)."""
    from incubator_xtable_spark.plans.registry import REGISTRY, _load_all
    from incubator_xtable_spark.streaming.pipeline import (
        events_stream,
        stream_stream_interval_join,
    )

    stream_dir = tmp_path / "events_in"
    stream_dir.mkdir()
    os.symlink(f"{SF_SMOKE}/events.parquet", stream_dir / "events.parquet")
    stream = events_stream(spark, str(stream_dir))
    joined = stream_stream_interval_join(stream)
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_interval")
        .outputMode("append")  # stream-stream inner joins emit append-only
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = sorted(map(tuple, spark.table("ss_interval").collect()))

    _load_all()
    batch = sorted(
        map(tuple, REGISTRY["events_interval_join"].fn(spark, SF_SMOKE).collect())
    )
    assert streamed == batch
    assert len(batch) > 0  # non-vacuous at sf0.001 (3 pairs)


def test_winnow_near_duplicates_find_planted(spark, docs_with_dups):
    """Winnowing inverted-index pairing: exact copies share their whole
    fingerprint set; one-token-appended near-dups still share almost all
    (shared runs >= w+k-1 guarantee a shared fingerprint)."""
    from incubator_xtable_spark.operators.dedup import winnow_near_duplicates

    pairs = winnow_near_duplicates(docs_with_dups, min_shared=2).collect()
    found = {(r["doc_a"], r["doc_b"]): r["n_shared"] for r in pairs}
    for d in range(5, 8):
        assert (d, d + 200000) in found, f"exact dup {d} missed by winnowing"
    near_hits = sum(1 for d in range(5) if (d, d + 100000) in found)
    assert near_hits >= 4, f"only {near_hits}/5 near-dups found"
    # exact copies share at least as many fingerprints as any other pair
    # involving the same doc
    assert all(n >= 2 for n in found.values())


def test_winnow_stop_fingerprints_bound_buckets(spark):
    """A fingerprint shared by > max_bucket docs must be dropped: 60
    identical docs with max_bucket=50 produce NO pairs (the bucket is a
    stop fingerprint), while 10 identical docs pair fully."""
    from incubator_xtable_spark.operators.dedup import winnow_near_duplicates

    text = " ".join(f"tok{i}" for i in range(30))
    big = spark.createDataFrame(
        [(i, text) for i in range(60)], "doc_id LONG, text STRING"
    )
    assert winnow_near_duplicates(big, max_bucket=50).count() == 0
    small = spark.createDataFrame(
        [(i, text) for i in range(10)], "doc_id LONG, text STRING"
    )
    assert winnow_near_duplicates(small, max_bucket=50).count() == 45


def test_streaming_session_windows_match_batch(spark, tmp_path):
    """Native session_window under a watermark == the batch registry
    entry (availableNow drain, complete output)."""
    from incubator_xtable_spark.plans.registry import REGISTRY, _load_all
    from incubator_xtable_spark.streaming.pipeline import (
        events_stream,
        session_window_counts,
    )

    stream_dir = tmp_path / "events_in"
    stream_dir.mkdir()
    os.symlink(f"{SF_SMOKE}/events.parquet", stream_dir / "events.parquet")
    agg = session_window_counts(events_stream(spark, str(stream_dir)))
    q = (
        agg.writeStream.format("memory")
        .queryName("ss_sessions")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = sorted(map(tuple, spark.table("ss_sessions").collect()))

    _load_all()
    batch = sorted(
        map(tuple, REGISTRY["events_session_window_agg"].fn(spark, SF_SMOKE).collect())
    )
    assert streamed == batch and len(batch) > 0


def test_training_samples_are_partition_layout_invariant(spark):
    """ADVICE r10: pq_train/kmeans_centroids drew their bounded training
    sample with a bare .limit(), so codebooks (and downstream ANN
    results/recall) depended on partition layout despite the fixed seed.
    The sample is now content-deterministic (ordered by xxhash64 of the
    vector before the limit): identical codebooks regardless of how the
    corpus is partitioned, even when the corpus exceeds max_sample."""
    from incubator_xtable_spark.operators.ann import kmeans_centroids, pq_train

    emb = load(spark, SF_SMOKE, "embeddings")
    n = emb.count()
    cap = max(8, n // 3)  # strictly smaller than the corpus: limit MUST choose
    assert cap < n
    layouts = [emb.repartition(1), emb.repartition(13), emb.coalesce(2)]
    books = [
        pq_train(df, dim=64, m=4, n_codes=8, max_sample=cap) for df in layouts
    ]
    assert books[0] == books[1] == books[2]
    cents = [
        kmeans_centroids(df, n_centroids=8, max_sample=cap) for df in layouts
    ]
    assert cents[0] == cents[1] == cents[2]


def test_embedding_near_duplicates_unlabeled_recall(spark):
    """The scale-safe UNLABELED embedding near-dup path: planted
    near-identical vectors must be recovered with recall >= 0.9 against
    the exact all-pairs baseline at the same threshold, with the exact
    same cosine values (LSH decides only WHO is compared)."""
    import numpy as np

    from incubator_xtable_spark.operators.dedup import embedding_near_duplicates

    rng = np.random.default_rng(11)
    base = rng.standard_normal((120, 64))
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(120)]
    # plant 30 near-dups: id 1000+i is id i plus tiny noise (cos ~ 0.999)
    planted = set()
    for i in range(30):
        noisy = base[i] + 0.02 * rng.standard_normal(64)
        rows.append((int(1000 + i), [float(x) for x in noisy]))
        planted.add((i, 1000 + i))
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")

    found = embedding_near_duplicates(emb, dim=64, threshold=0.9).collect()
    got = {(r["vec_a"], r["vec_b"]) for r in found}

    # exact all-pairs baseline (numpy) at the same threshold
    mat = np.array([r[1] for r in rows])
    ids = [r[0] for r in rows]
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = norm @ norm.T
    exact = {
        (min(ids[i], ids[j]), max(ids[i], ids[j]))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if sims[i, j] >= 0.9
    }
    assert planted <= exact  # sanity: the plant really is above threshold
    recall = len(got & exact) / len(exact)
    assert recall >= 0.9, f"unlabeled embedding near-dup recall {recall:.2f}"
    # precision is structural: every reported pair passed the EXACT
    # cosine filter — verify values against numpy to 5 dp
    idx = {v: i for i, v in enumerate(ids)}
    for r in found:
        assert abs(r["cos_sim"] - sims[idx[r["vec_a"]], idx[r["vec_b"]]]) < 1e-5


def test_cos_verify_pairs_tiers_identical(spark, monkeypatch):
    """r14: the verify kernel's two tiers — bounded-corpus broadcast
    gather (ids-only boundary payload) and the at-scale join re-attach —
    must produce IDENTICAL rows, and pairs naming an id absent from the
    corpus must drop exactly like the inner joins they replace."""
    import numpy as np

    from incubator_xtable_spark.operators.ann import cos_verify_pairs

    rng = np.random.default_rng(3)
    mat = rng.standard_normal((40, 16))
    vecs = spark.createDataFrame(
        [(int(i), [float(x) for x in mat[i]]) for i in range(40)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    pair_rows = [(int(i), int(j)) for i in range(0, 30, 3) for j in range(i + 1, 40, 7)]
    pair_rows.append((5, 999))  # 999 absent from the corpus -> must drop
    pairs = spark.createDataFrame(pair_rows, "vec_a LONG, vec_b LONG")

    def run():
        return sorted(
            (r["vec_a"], r["vec_b"], r["cos_raw"])
            for r in cos_verify_pairs(
                pairs, vecs, id_col="vec_id", vec_col="embedding", dim=16
            ).collect()
        )

    gathered = run()  # default gate: 40x16 doubles is far under the bound
    monkeypatch.setenv("XT_BROADCAST_VECS_MAX_BYTES", "0")  # force join tier
    joined = run()
    assert gathered == joined and len(gathered) == len(pair_rows) - 1
    assert all(v not in (999,) for _, v, _ in gathered)

    # same contract for the ANN rerank seam (distinct query/candidate
    # frames, broadcast-qv join fallback)
    from pyspark.sql import functions as F

    from incubator_xtable_spark.operators.ann import cos_rerank_pairs

    qf = vecs.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    cf = vecs.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("cv"))
    sl = spark.createDataFrame(
        [(int(i), int(j)) for i in range(6) for j in range(10, 40, 4)] + [(2, 999)],
        "q_id LONG, c_id LONG",
    )

    def run_rr():
        return sorted(
            (r["q_id"], r["c_id"], r["cos_raw"])
            for r in cos_rerank_pairs(sl, qf, cf, dim=16).collect()
        )

    monkeypatch.delenv("XT_BROADCAST_VECS_MAX_BYTES")
    g2 = run_rr()
    monkeypatch.setenv("XT_BROADCAST_VECS_MAX_BYTES", "0")
    j2 = run_rr()
    assert g2 == j2 and len(g2) == 6 * 8  # the (2, 999) row dropped


def test_fused_ann_tiers_identical(spark, monkeypatch):
    """r15: every ANN operator's fused single-pass tier (bounded queries:
    encode + probe + score in ONE mapInArrow) must produce rows IDENTICAL
    to the join tier it bypasses — including under planted exact-duplicate
    vectors, which force approx_dot/cos_raw TIES at the shortlist and
    final-rank boundaries (the c_id tie-break must resolve the same on
    both tiers)."""
    import numpy as np

    from incubator_xtable_spark.operators.ann import (
        ann_ivf_topk,
        ann_ivfpq_topk,
        ann_lsh_md5_topk,
        ann_lsh_topk,
        ann_pq_topk,
    )

    rng = np.random.default_rng(11)
    mat = rng.standard_normal((60, 16))
    # planted ties: exact duplicates (same codes -> same approx_dot, same
    # cos_raw) scattered across the id range so ranks tie-break on c_id
    for dup in (17, 23, 41, 52):
        mat[dup] = mat[3]
    for dup in (29, 37):
        mat[dup] = mat[8]
    vecs = spark.createDataFrame(
        [(int(i), [float(x) for x in mat[i]]) for i in range(60)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    queries = vecs.filter(F.col("vec_id") < 5)

    cases = {
        "ivfpq": lambda: ann_ivfpq_topk(
            vecs, queries, dim=16, k=3, n_centroids=4, n_probe=2, m=4, n_codes=8, refine=2
        ),
        "pq": lambda: ann_pq_topk(
            vecs, queries, dim=16, k=3, m=4, n_codes=8, refine=2
        ),
        "ivf": lambda: ann_ivf_topk(vecs, queries, k=3, n_centroids=4, n_probe=2),
        "lsh": lambda: ann_lsh_topk(
            vecs, queries, k=3, dim=16, n_planes=6, n_bands=2, multiprobe=True
        ),
        "lsh_md5": lambda: ann_lsh_md5_topk(
            vecs, queries, k=3, dim=16, n_planes=12, n_bands=3
        ),
    }
    for name, make in cases.items():
        monkeypatch.delenv("XT_BROADCAST_VECS_MAX_BYTES", raising=False)
        fused = sorted(map(tuple, make().collect()))
        monkeypatch.setenv("XT_BROADCAST_VECS_MAX_BYTES", "0")  # force join tier
        joined = sorted(map(tuple, make().collect()))
        monkeypatch.delenv("XT_BROADCAST_VECS_MAX_BYTES")
        assert fused == joined, f"{name}: fused tier diverged from join tier"
        assert fused, f"{name}: no rows"


def test_embedding_near_duplicates_partition_layout_invariant(spark):
    """Deterministic blocking: identical pair sets across partition layouts."""
    import numpy as np

    from incubator_xtable_spark.operators.dedup import embedding_near_duplicates

    rng = np.random.default_rng(5)
    base = rng.standard_normal((60, 64))
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(60)]
    for i in range(10):
        rows.append((int(500 + i), [float(x) for x in base[i] + 0.01]))
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    a = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_near_duplicates(emb.repartition(1), dim=64, threshold=0.9).collect()
    }
    b = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_near_duplicates(emb.repartition(9), dim=64, threshold=0.9).collect()
    }
    assert a == b and a


def test_ann_ivfpq_recall_gates(spark):
    """IVF-PQ quality gates: (a) clearly-above-chance recall vs brute
    force; (b) at an EQUAL exact-score budget, probing more cells with
    compressed-domain scoring recalls at least as well as IVF probing
    fewer cells with exact scoring; (c) probing every cell with a
    full-corpus shortlist is exact (recall 1.0)."""
    from incubator_xtable_spark.operators.ann import ann_ivf_topk, ann_ivfpq_topk

    brute = ann_bruteforce_topk(spark, SF_SMOKE).collect()
    truth = {(r["q_id"], r["c_id"]) for r in brute}
    emb = load(spark, SF_SMOKE, "embeddings")
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < 8)

    approx = ann_ivfpq_topk(
        emb, queries, dim=64, k=5, n_centroids=16, n_probe=6, m=8, n_codes=16, refine=6
    ).collect()
    got = {(r["q_id"], r["c_id"]) for r in approx}
    recall = len(truth & got) / len(truth)
    # 64-dim unclustered gaussians are the hard case (measured landscape:
    # 0.25@probe4/refine4 -> 0.62@probe8/refine8, monotone in budget)
    assert recall > 0.3, f"IVF-PQ recall {recall:.2f} at chance level"
    assert all(1 <= r["rank"] <= 5 for r in approx)

    # equal exact-score budget: IVF-PQ spends k*refine=30 exact scores
    # per query (after compressed scans of 6/16 of the corpus); IVF with
    # n_probe=1 exact-scores ~n/16 >= 30 candidates — comparable exact
    # work — yet IVF-PQ must recall at least as well (it saw 6x the
    # candidates in the compressed domain; measured 0.40 vs 0.075)
    ivf1 = ann_ivf_topk(emb, queries, k=5, n_centroids=16, n_probe=1).collect()
    got_ivf1 = {(r["q_id"], r["c_id"]) for r in ivf1}
    recall_ivf1 = len(truth & got_ivf1) / len(truth)
    assert recall >= recall_ivf1, (
        f"IVF-PQ {recall:.2f} must beat single-probe IVF {recall_ivf1:.2f} "
        "at equal exact-score budget"
    )

    # probe everything + shortlist the whole corpus -> exact
    full = ann_ivfpq_topk(
        emb, queries, dim=64, k=5, n_centroids=16, n_probe=16, m=8,
        n_codes=16, refine=(n // 5) + 1,
    ).collect()
    got_full = {(r["q_id"], r["c_id"]) for r in full}
    assert len(truth & got_full) / len(truth) == 1.0


def test_lsh_bucket_bands_matches_per_band_lsh_bucket(spark):
    """The one-3-D-literal banded key expression must be value-identical
    to the original per-band lsh_bucket (same hyperplane family per
    band) — the fast form is an ANALYSIS-time optimization only."""
    from incubator_xtable_spark.operators.ann import lsh_bucket, lsh_bucket_bands

    emb = load(spark, SF_SMOKE, "embeddings").limit(64)
    bad = (
        emb.select(
            lsh_bucket_bands(F.col("embedding"), 64, 8, 4, 42).alias("multi"),
            F.array(
                *[lsh_bucket(F.col("embedding"), 64, 8, 42 + 1000 * b) for b in range(4)]
            ).alias("single"),
        )
        .filter(F.col("multi") != F.col("single"))
        .count()
    )
    assert bad == 0


def test_media_near_duplicates_planted_images(spark):
    """Multimodal near-dup: planted near-identical PNGs, GIFs (r12
    pure-stdlib LZW pixel decode) AND JPEGs (r13 baseline huffman +
    DC-luma decode) plus a re-encoded WAV must pair with small Hamming;
    an unrelated random image must NOT pair with them. Mime blocking
    keeps PNG, GIF, JPEG and audio in separate buckets by construction —
    a GIF or JPEG re-encode of a PNG's pixels can never cross-pair even
    at Hamming 0."""
    import random

    from incubator_xtable_spark.operators.media_codecs import (
        encode_gif_from_pixels,
        encode_jpeg_from_pixels,
        encode_png_from_pixels,
        encode_wav,
    )
    from incubator_xtable_spark.operators.multimodal import media_near_duplicates

    rnd = random.Random(7)
    blobs = []
    planted = set()
    # 10 random base images + a perturbed twin for the first 4
    bases = []
    for i in range(10):
        pix = [[rnd.randrange(256) for _ in range(24)] for _ in range(18)]
        bases.append(pix)
        blobs.append((i, encode_png_from_pixels(pix)))
    for i in range(4):
        twin = [r[:] for r in bases[i]]
        for k in range(6):
            twin[k][k] = (twin[k][k] + 2) & 0xFF
        blobs.append((100 + i, encode_png_from_pixels(twin)))
        planted.add((i, 100 + i))
    # GIF tier: 4 random bases + perturbed twins for the first 3, one of
    # them interlaced (de-weave must not perturb the fingerprint)
    gif_bases = []
    for i in range(4):
        pix = [[rnd.randrange(256) for _ in range(24)] for _ in range(18)]
        gif_bases.append(pix)
        blobs.append((300 + i, encode_gif_from_pixels(pix)))
    for i in range(3):
        twin = [r[:] for r in gif_bases[i]]
        for k in range(6):
            twin[k][k] = (twin[k][k] + 2) & 0xFF
        blobs.append((400 + i, encode_gif_from_pixels(twin, interlace=(i == 0))))
        planted.add((300 + i, 400 + i))
    # a GIF re-encode of PNG base 0's exact pixels: mime-blocked from PNGs
    blobs.append((500, encode_gif_from_pixels(bases[0])))
    # JPEG tier (r13): the decoder sees the 1/8-scale DC luma, so bases
    # are block-structured (random value per 8x8 block) and twins
    # perturb individual pixels — invisible to block means, hamming ~0.
    # One twin rides a restart-interval stream, one a 3-component
    # (neutral-chroma) frame: both interleave paths must not perturb the
    # fingerprint.
    jpeg_bases = []
    for i in range(4):
        blk = [[rnd.randrange(256) for _ in range(12)] for _ in range(10)]
        pix = [[blk[y // 8][x // 8] for x in range(96)] for y in range(80)]
        jpeg_bases.append(pix)
        blobs.append((600 + i, encode_jpeg_from_pixels(pix)))
    for i in range(3):
        twin = [r[:] for r in jpeg_bases[i]]
        for k in range(24):
            y, x = rnd.randrange(80), rnd.randrange(96)
            twin[y][x] = max(0, min(255, twin[y][x] + rnd.randint(-12, 12)))
        kw = {}
        if i == 0:
            kw["restart_interval"] = 3
        elif i == 1:
            kw["color"] = True
            kw["subsampling"] = (2, 2)  # the real-world 4:2:0 MCU shape
        blobs.append((700 + i, encode_jpeg_from_pixels(twin, **kw)))
        planted.add((600 + i, 700 + i))
    # a JPEG re-encode of PNG base 0's exact pixels: mime-blocked too
    blobs.append((800, encode_jpeg_from_pixels(bases[0])))
    # identical audio content at two ids (same synthesizer params)
    blobs.append((200, encode_wav(1234)))
    blobs.append((201, encode_wav(1234)))
    planted.add((200, 201))
    df = spark.createDataFrame(blobs, "media_id LONG, content BINARY")

    pairs = media_near_duplicates(df, max_hamming=2).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    recall = len(got & planted) / len(planted)
    assert recall >= 0.9, f"planted multimodal near-dup recall {recall:.2f}: {got}"
    # no cross-mime pairs and no random-random pairs at this distance
    for r in pairs:
        assert r["hamming"] <= 2
    cross = {(a, b) for a, b in got if a < 10 and b < 10}
    assert not cross, f"unrelated random images paired: {cross}"
    # the pixel-identical PNG/GIF and PNG/JPEG pairs are blocked by mime
    assert (0, 500) not in got and (500, 0) not in got
    assert (0, 800) not in got and (800, 0) not in got
    gif_cross = {(a, b) for a, b in got if 300 <= a < 310 and 300 <= b < 310}
    assert not gif_cross, f"unrelated random GIFs paired: {gif_cross}"
    jpeg_cross = {(a, b) for a, b in got if 600 <= a < 610 and 600 <= b < 610}
    assert not jpeg_cross, f"unrelated random JPEGs paired: {jpeg_cross}"


def test_media_dhash_quarantine_and_strict(spark):
    """MP4 video without decodable MJPEG sample tables stays quarantined
    (r14: the error names the missing tables instead of a blanket
    'unsupported'); a JPEG whose entropy data is not decodable (the
    header-only fixture encoder's fake scan) quarantines with the decode
    error, never a wrong hash; garbage quarantines; strict mode names
    the media_id."""
    from incubator_xtable_spark.operators.media_codecs import (
        encode_jpeg,
        encode_mp4,
    )
    from incubator_xtable_spark.operators.multimodal import media_dhash

    df = spark.createDataFrame(
        [
            (1, encode_jpeg(10, 10)),
            (2, b"\x00\x01garbage"),
            (3, encode_mp4(320, 240, duration_ms=1000)),
        ],
        "media_id LONG, content BINARY",
    )
    rows = {r["media_id"]: r for r in media_dhash(df).collect()}
    assert rows[1]["dhash"] is None and rows[1]["error"]  # undecodable scan
    assert rows[2]["dhash"] is None and rows[2]["error"]
    assert rows[3]["dhash"] is None and "video track" in rows[3]["error"]
    with pytest.raises(Exception, match="media_id="):
        media_dhash(df, strict=True).collect()


def test_embedding_dedup_pipeline_transitive_and_keeper(spark):
    """Planted transitive embedding near-dups: A~B and B~C above the
    cosine threshold (A~C possibly below) must land in ONE cluster with
    exactly the min id kept — the same decision contract as the text
    pipeline."""
    import numpy as np

    from incubator_xtable_spark.operators.dedup import embedding_dedup_keep_decisions

    rng = np.random.default_rng(23)
    a = rng.standard_normal(64)
    step = rng.standard_normal(64) * 0.18
    rows = [
        (1, [float(x) for x in a]),
        (2, [float(x) for x in a + step]),
        (3, [float(x) for x in a + 2 * step]),
    ]
    for i in range(20):  # unrelated background vectors
        rows.append((100 + i, [float(x) for x in rng.standard_normal(64)]))
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    out = {r["vec_id"]: (r["cluster_id"], r["keep"])
           for r in embedding_dedup_keep_decisions(emb, dim=64, threshold=0.9).collect()}
    assert set(out) >= {1, 2, 3}
    assert {out[i][0] for i in (1, 2, 3)} == {1}
    assert out[1][1] is True and out[2][1] is False and out[3][1] is False
    # background vectors with no near-dup never appear
    assert all(k in (1, 2, 3) for k in out), out


def test_media_dedup_keep_decisions(spark):
    from incubator_xtable_spark.operators.media_codecs import encode_png_from_pixels
    from incubator_xtable_spark.operators.multimodal import media_dedup_keep_decisions
    import random

    rnd = random.Random(9)
    base = [[rnd.randrange(256) for _ in range(20)] for _ in range(16)]
    twin = [r[:] for r in base]
    twin[0][0] = (twin[0][0] + 2) & 0xFF
    other = [[rnd.randrange(256) for _ in range(20)] for _ in range(16)]
    df = spark.createDataFrame(
        [(5, encode_png_from_pixels(base)), (9, encode_png_from_pixels(twin)),
         (30, encode_png_from_pixels(other))],
        "media_id LONG, content BINARY",
    )
    out = {r["media_id"]: (r["cluster_id"], r["keep"])
           for r in media_dedup_keep_decisions(df).collect()}
    assert out == {5: (5, True), 9: (5, False)}


def test_ivf_cell_partitioned_corpus_prunes_scan(spark, tmp_path):
    """The 100 TB IVF layout: persist the corpus partitionBy(cell) and a
    query's probe-set filter becomes PARTITION PRUNING — the scan reads
    only the probed cells' files (inputFiles pinned) and the plan
    carries the cell predicate as a partition filter, not a row filter
    after a full scan."""
    from incubator_xtable_spark.operators.ann import ivf_assign_cells, kmeans_centroids

    emb = load(spark, SF_SMOKE, "embeddings")
    cents = kmeans_centroids(emb, n_centroids=8)
    out = str(tmp_path / "ivf_corpus")
    ivf_assign_cells(emb, cents).write.partitionBy("cell").parquet(out)

    probed = [0, 3]
    scan = spark.read.parquet(out).filter(F.col("cell").isin(probed))
    # EXECUTION-time file set (inputFiles() is plan-level and ignores
    # partition filters): only probed cells' directories may be opened
    files = [r[0] for r in scan.select(F.input_file_name()).distinct().collect()]
    assert files, "probed cells must exist in this corpus"
    import re

    touched = {int(re.search(r"cell=(\d+)", f).group(1)) for f in files}
    assert touched <= set(probed), f"scan opened unprobed cells: {touched}"
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    # row parity: pruned read == full read filtered
    full = spark.read.parquet(out)
    assert scan.count() == full.filter(F.col("cell").isin(probed)).count()


def test_corpus_curation_composition_end_to_end(spark):
    """The full curation story composes: quality gate -> EXACT dedup ->
    fuzzy (MinHash->Jaccard->components) keep/drop -> embedding near-dup
    keep/drop — each stage a monotone corpus filter, the whole chain
    deterministic across runs. This is the composition a 100 TB
    training-data pipeline runs; every stage's own quality gates live in
    their operator tests, this pins that they CHAIN (schemas line up,
    anti-join shapes compose, nothing recomputes nondeterministically)."""
    from incubator_xtable_spark.operators.dedup import (
        embedding_dedup_keep_decisions,
        fuzzy_dedup_keep_decisions,
    )

    docs = load(spark, SF_SMOKE, "documents")
    emb = load(spark, SF_SMOKE, "embeddings")
    n0 = docs.count()

    def run_chain():
        # 1. quality gate (the text_quality_score heuristics inline):
        #    drop ultra-short docs and whitespace-degenerate docs
        toks = F.split(F.col("text"), " ")
        q = docs.filter((F.size(toks) >= 5) & (F.col("n_chars") >= 20))
        # 2. exact dedup: keep min doc_id per exact text
        from pyspark.sql import Window as W

        w = W.partitionBy("text").orderBy("doc_id")
        exact = q.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
        # 3. fuzzy dedup keep/drop
        fuzzy_drops = fuzzy_dedup_keep_decisions(exact, threshold=0.5).filter(
            ~F.col("keep")
        )
        after_fuzzy = exact.join(fuzzy_drops.select("doc_id"), "doc_id", "left_anti")
        # 4. embedding near-dup keep/drop over the surviving docs' vectors
        surv_emb = emb.join(
            after_fuzzy.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
        )
        emb_drops = embedding_dedup_keep_decisions(
            surv_emb, dim=64, threshold=0.4
        ).filter(~F.col("keep"))
        final = after_fuzzy.join(
            emb_drops.select(F.col("vec_id").alias("doc_id")), "doc_id", "left_anti"
        )
        return q.count(), exact.count(), after_fuzzy.count(), sorted(
            r["doc_id"] for r in final.select("doc_id").collect()
        )

    n_q, n_exact, n_fuzzy, final_ids = run_chain()
    # monotone shrinkage, nothing degenerate
    assert n0 >= n_q >= n_exact >= n_fuzzy >= len(final_ids) > 0
    # deterministic: the same chain yields the same corpus
    assert run_chain()[3] == final_ids


# ---------------------------------------------------------------------------
# distributed BPE merge learning
# ---------------------------------------------------------------------------


def _reference_bpe(texts, n_merges, min_freq=2):
    """Independent pure-Python BPE (Sennrich 2016) with the operator's
    tie-break (count desc, pair asc) — the differential oracle."""
    import collections

    freq = collections.Counter(w for t in texts for w in t.split(" ") if w)
    vocab = {tuple(w): c for w, c in freq.items()}
    out = []
    for rank in range(n_merges):
        pc = collections.Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if n < min_freq:
            break
        out.append((rank, a, b, n))
        newv = {}
        for syms, c in vocab.items():
            merged = []
            for s in syms:
                if merged and merged[-1] == a and s == b:
                    merged[-1] = a + b
                else:
                    merged.append(s)
            k = tuple(merged)
            newv[k] = newv.get(k, 0) + c
        vocab = newv
    return out


def test_bpe_merges_match_reference(spark):
    from incubator_xtable_spark.operators.bpe import learn_bpe_merges

    docs = load(spark, SF_SMOKE, "documents")
    got = learn_bpe_merges(docs, n_merges=8)
    texts = [r["text"] for r in docs.select("text").collect()]
    assert got == _reference_bpe(texts, 8)
    assert len(got) == 8  # this corpus has at least 8 learnable merges


def test_bpe_merges_partition_layout_invariant(spark):
    from incubator_xtable_spark.operators.bpe import learn_bpe_merges

    docs = load(spark, SF_SMOKE, "documents")
    a = learn_bpe_merges(docs.repartition(17), n_merges=5)
    b = learn_bpe_merges(docs.coalesce(1), n_merges=5)
    assert a == b and len(a) == 5


def test_ivfpq_partitioned_serving_prunes_files_and_matches_inmemory(spark, tmp_path):
    """The IVF-PQ serving layout (r12): encode the corpus with
    ivfpq_encode_corpus, persist partitionBy(cell), and
    ann_ivfpq_topk_partitioned must (a) return EXACTLY what the
    in-memory ann_ivfpq_topk returns for the same trained pair — the
    static probe-set filter is a superset of every query's probes, so
    recall is unchanged by construction — while (b) opening only the
    probed cells' FILES (execution-time input_file_name check) and (c)
    carrying the cell predicate as a PartitionFilter in the scan."""
    import re

    from incubator_xtable_spark.operators.ann import (
        ann_ivfpq_topk,
        ann_ivfpq_topk_partitioned,
        ivfpq_encode_corpus,
        ivfpq_probe_cells,
        ivfpq_train,
    )

    emb = load(spark, SF_SMOKE, "embeddings")
    dim = 64
    trained = ivfpq_train(emb, dim=dim, n_centroids=16, m=8, n_codes=16)
    out = str(tmp_path / "ivfpq_corpus")
    ivfpq_encode_corpus(emb, trained, dim=dim).write.partitionBy("cell").parquet(out)
    corpus = spark.read.parquet(out)
    queries = emb.orderBy("vec_id").limit(6)

    got = ann_ivfpq_topk_partitioned(
        corpus, queries, trained=trained, dim=dim, k=5, n_probe=3
    )
    want = ann_ivfpq_topk(
        emb, queries, dim=dim, k=5, n_probe=3, trained=trained
    )
    as_set = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
    assert as_set(got) == as_set(want)

    # file-level pruning: the pruned scan opens ONLY probed cells' files
    cells = ivfpq_probe_cells(queries, trained, n_probe=3)
    assert 0 < len(cells) < 16, cells  # a real subset, or the test is vacuous
    pruned = corpus.filter(F.col("cell").isin(cells))
    files = [r[0] for r in pruned.select(F.input_file_name()).distinct().collect()]
    assert files
    touched = {int(re.search(r"cell=(\d+)", f).group(1)) for f in files}
    assert touched <= set(cells), f"opened unprobed cells: {touched - set(cells)}"
    # scanned-file fraction ~ probed-cell fraction of the whole corpus
    all_files = [r[0] for r in corpus.select(F.input_file_name()).distinct().collect()]
    assert len(files) < len(all_files)
    # the serving plan itself carries the partition filter on the scan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and re.search(r"cell.*(IN|isin|in)", plan, re.I), plan


def test_hash_embed_properties_and_near_dup_composition(spark):
    """Feature-hashing embeddings (r12): content-deterministic on any
    partition layout, unit-norm, similar for lightly-edited docs and
    dissimilar for unrelated ones — and they COMPOSE with the embedding
    near-dup operator (a planted edited twin is detected, unrelated
    docs are not)."""
    import math
    import random

    from incubator_xtable_spark.operators.dedup import embedding_near_duplicates
    from incubator_xtable_spark.operators.hash_embed import hash_embed

    rnd = random.Random(31)
    words = [f"w{i}" for i in range(500)]
    base_txt = " ".join(rnd.choice(words) for _ in range(80))
    edited = base_txt.split(" ")
    edited[7] = "changed"
    rows = [(1, base_txt), (2, " ".join(edited))]
    for i in range(20):
        rows.append((100 + i, " ".join(rnd.choice(words) for _ in range(80))))
    rows.append((999, ""))  # degenerate: embeds as the zero vector
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")

    out1 = {r["doc_id"]: r["embedding"] for r in hash_embed(docs.repartition(1)).collect()}
    out13 = {r["doc_id"]: r["embedding"] for r in hash_embed(docs.repartition(13)).collect()}
    assert out1 == out13  # exact layout invariance

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na, nb = math.sqrt(sum(x * x for x in a)), math.sqrt(sum(y * y for y in b))
        return num / (na * nb) if na and nb else 0.0

    for did, v in out1.items():
        n = math.sqrt(sum(x * x for x in v))
        if did == 999:
            assert n == 0.0
        else:
            assert abs(n - 1.0) < 1e-9, did
    assert cos(out1[1], out1[2]) > 0.9
    unrelated = [cos(out1[1], out1[100 + i]) for i in range(20)]
    assert max(unrelated) < 0.8 and sum(unrelated) / 20 < 0.5

    # composition: the near-dup operator finds exactly the planted twin
    # (zero vectors filter out first — embedding_near_duplicates' cosine
    # contract, same as any encoder pipeline dropping empty docs)
    emb = (
        hash_embed(docs)
        .withColumnRenamed("doc_id", "vec_id")
        .filter(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x) > 0)
    )
    pairs = embedding_near_duplicates(emb, dim=64, threshold=0.9).collect()
    got = {(r["vec_a"], r["vec_b"]) for r in pairs}
    assert (1, 2) in got
    assert all({a, b} == {1, 2} for a, b in got), got


def _py_bpe_apply(word, merges):
    """Independent left-to-right non-overlapping BPE application."""
    syms = list(word)
    for a, b in merges:
        out = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return syms


def test_bpe_encode_replace_chain_matches_fold_and_reference(spark):
    """The encode operator's whole-stage-codegen string-replace chain
    must tokenize EXACTLY like the learner's aggregate() fold
    (_merge_pair_expr) and the independent Python reference — including
    overlap chains (aaaa under (a,a)) and chained multi-char merges."""
    from pyspark.sql import functions as F

    from incubator_xtable_spark.operators.bpe import (
        _merge_pair_expr,
        bpe_apply_expr,
    )

    merges = [("a", "a"), ("t", "h"), ("th", "e"), ("aa", "aa"), ("e", "r")]
    words = [
        "aaaa", "aaaaa", "aaaaaaaa", "the", "theather", "ther", "thth",
        "aathe", "xaay", "ba", "ab", "", "a", "aather",
    ]
    df = spark.createDataFrame([(w,) for w in words if w], "w STRING")
    fold = F.split(F.col("w"), "").alias("syms")
    folded = df.select("w", fold)
    for a, b in merges:
        folded = folded.select("w", _merge_pair_expr("syms", a, b).alias("syms"))
    enc = df.select(
        "w",
        F.split(bpe_apply_expr(F.col("w"), merges), "\x01").alias("parts"),
    ).select(
        "w",
        F.expr(
            "transform(slice(parts, 2, size(parts) - 1), "
            "p -> substring(p, 1, length(p) - 1))"
        ).alias("toks"),
    )
    fold_map = {r["w"]: list(r["syms"]) for r in folded.collect()}
    repl_map = {r["w"]: list(r["toks"]) for r in enc.collect()}
    for w in words:
        if not w:
            continue
        expect = _py_bpe_apply(w, merges)
        assert fold_map[w] == expect, (w, fold_map[w], expect)
        assert repl_map[w] == expect, (w, repl_map[w], expect)


def test_bpe_learn_then_encode_composition(spark):
    """Composition gate (VERDICT r12 #7): merges LEARNED from the corpus
    feed the encode operator, and per-doc token counts match an
    independent Python tokenization under the same learned table."""
    from incubator_xtable_spark.operators.bpe import (
        bpe_encode_doc_stats,
        learn_bpe_merges,
    )

    docs = load(spark, SF_SMOKE, "documents")
    learned = learn_bpe_merges(docs, n_merges=8)
    assert len(learned) == 8
    merges = [(a, b) for _rank, a, b, _n in learned]
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in bpe_encode_doc_stats(docs, merges).collect()
    }
    rows = docs.select("doc_id", "text").collect()
    for r in rows:
        ws = [w for w in r["text"].split(" ") if w]
        n_tokens = sum(len(_py_bpe_apply(w, merges)) for w in ws)
        assert got[r["doc_id"]] == (len(ws), n_tokens), r["doc_id"]


def test_bigram_lm_score_survives_degenerate_texts(spark, tmp_path):
    """Review pin: documents with empty / whitespace-only / single-token
    text yield no bigrams and must be EXCLUDED (both engines agree) —
    not crash Spark's slice(w, 1, size-1) with a negative length."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from incubator_xtable_spark.plans.registry import REGISTRY, _load_all

    _load_all()
    d = tmp_path / "edge_docs"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "text": ["the cat sat", "", "   ", "one", "the cat ran far"],
                "lang": ["en"] * 5,
                "source": ["t"] * 5,
                "n_chars": pa.array([11, 0, 3, 3, 15], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["lm_score_e6"])
        for r in REGISTRY["text_bigram_lm_score"].fn(spark, str(d)).collect()
    }
    assert set(got) == {1, 5}  # degenerate docs excluded, no crash
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    oracle = {
        row[0]: (row[1], row[2])
        for row in con.execute(REGISTRY["text_bigram_lm_score"].oracle).fetchall()
    }
    assert got == oracle


# ---------------------------------------------------------------------------
# r14: md5 (oracle-expressible) hash family — quality matches the legacy
# families and the exact extractor matches a pure-Python reference
# ---------------------------------------------------------------------------


def test_minhash_md5_family_finds_planted_dups(spark, docs_with_dups):
    pairs = minhash_near_duplicates(
        docs_with_dups, threshold=0.5, hash_family="md5"
    ).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    for d in range(5, 8):
        assert (d, d + 200000) in found, f"exact dup {d} missed (md5 family)"
    near_hits = sum(1 for d in range(5) if (d, d + 100000) in found)
    assert near_hits >= 3, f"only {near_hits}/5 near-dups found (md5 family)"
    for r in pairs:
        assert 0.5 <= r["jaccard"] <= 1.0


def test_simhash_md5_family_finds_exact_dups(spark, docs_with_dups):
    pairs = simhash_near_duplicates(
        docs_with_dups, max_hamming=3, bits=32, n_bands=4, hash_family="md5"
    ).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    for d in range(5, 8):
        assert (d, d + 200000) in found, f"exact dup {d} missed (md5 simhash)"
    exact_keys = {(d, d + 200000) for d in range(5, 8)}
    assert all(r["hamming"] == 0 for r in pairs if (r["doc_a"], r["doc_b"]) in exact_keys)
    # md5 family refuses > 32 bits loudly (only 32 hash bits derived)
    with pytest.raises(ValueError, match="32"):
        simhash_near_duplicates(docs_with_dups, bits=64, hash_family="md5").collect()


def test_ann_lsh_md5_recall_and_rerank_exactness(spark):
    from incubator_xtable_spark.operators.ann import ann_lsh_md5_topk

    brute = ann_bruteforce_topk(spark, SF_SMOKE).collect()
    truth = {(r["q_id"], r["c_id"]) for r in brute}
    brute_sim = {(r["q_id"], r["c_id"]): r["cos_sim"] for r in brute}
    emb = load(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    approx = ann_lsh_md5_topk(emb, queries, k=5).collect()
    got = {(r["q_id"], r["c_id"]) for r in approx}
    recall = len(truth & got) / len(truth)
    assert recall > 0.1, f"md5-LSH recall {recall:.2f} at chance level"
    # the rerank is EXACT cosine: any pair also in the brute-force top-5
    # must carry the identical rounded similarity
    for r in approx:
        key = (r["q_id"], r["c_id"])
        if key in brute_sim:
            assert r["cos_sim"] == brute_sim[key]
    assert all(1 <= r["rank"] <= 5 for r in approx)


def test_ann_lsh_md5_layout_invariance(spark):
    """Band keys are row-local (integer matmul per row): repartitioning
    the corpus must not change the result set."""
    from incubator_xtable_spark.operators.ann import ann_lsh_md5_topk

    emb = load(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    a = ann_lsh_md5_topk(emb, queries, k=5).collect()
    b = ann_lsh_md5_topk(emb.repartition(13), queries, k=5).collect()
    key = lambda r: (r["q_id"], r["rank"])  # noqa: E731
    assert sorted(((r["q_id"], r["c_id"], r["cos_sim"], r["rank"]) for r in a)) == sorted(
        ((r["q_id"], r["c_id"], r["cos_sim"], r["rank"]) for r in b)
    )


def test_exact_feature_extract_matches_python_reference(spark):
    """The integer chunk-mean features equal a from-scratch Python
    computation on the same bytes, including the numpy.array_split
    boundary rule and short blobs (n < n_features)."""
    from incubator_xtable_spark.operators.multimodal import exact_feature_extract

    texts = ["", "a", "ab", "abcdefg", "abcdefgh", "abcdefghi", "hello world " * 7]
    rows = [(i, "image", t.encode()) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "media_id LONG, media_type STRING, content BINARY")
    got = {r["media_id"]: r for r in exact_feature_extract(df).collect()}

    def ref(data, k, n_features=8):
        n = len(data)
        base, extra = divmod(n, n_features)
        length = base + (1 if k < extra else 0)
        start = k * base + min(k, extra)
        if length == 0:
            return 0
        s = sum(data[start : start + length])
        return (2 * s * 10**6 + length) // (2 * length)

    for i, t in enumerate(texts):
        data = t.encode()
        r = got[i]
        assert r["n_bytes"] == len(data)
        assert r["f1_e6"] == ref(data, 0), (i, t)
        assert r["f2_e6"] == ref(data, 1), (i, t)


def test_embedding_md5_lsh_finds_planted_twins(spark):
    """The oracle-certified md5 embedding LSH still behaves as a
    near-dup detector: planted near-identical vectors (tiny
    perturbation — signatures agree on >= 1 band) surface as pairs with
    cos_sim ~ 1, and the pair set is layout-invariant."""
    import numpy as np

    from incubator_xtable_spark.operators.dedup import embedding_near_duplicates_md5

    rng = np.random.default_rng(5)
    rows = []
    for i in range(40):
        v = rng.standard_normal(64)
        rows.append((i, [float(x) for x in v]))
        if i < 6:  # plant a twin at id+1000
            w = v + rng.standard_normal(64) * 0.01
            rows.append((i + 1000, [float(x) for x in w]))
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    pairs = embedding_near_duplicates_md5(df, dim=64, threshold=0.9).collect()
    found = {(r["vec_a"], r["vec_b"]) for r in pairs}
    hits = sum(1 for i in range(6) if (i, i + 1000) in found)
    assert hits >= 5, f"only {hits}/6 planted twins found"
    for r in pairs:
        assert r["cos_sim"] >= 0.9
    again = embedding_near_duplicates_md5(df.repartition(7), dim=64, threshold=0.9).collect()
    assert sorted((r["vec_a"], r["vec_b"], r["cos_sim"]) for r in pairs) == sorted(
        (r["vec_a"], r["vec_b"], r["cos_sim"]) for r in again
    )
