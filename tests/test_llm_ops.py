"""Behavioral tests for LLM-pipeline operators that have no SQL oracle:
IVF approximate search (recall vs exact), winnowing fingerprints
(duplicate detection), multimodal feature plumbing, and LSH recall on
planted near-duplicates."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lsd2_spark.operators import dedup, multimodal, similarity, text_analysis

SF_DIR = "/root/testdata/sf0.001"


def test_ivf_recall_vs_bruteforce(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    exact = similarity.cosine_topk(emb, queries, "embedding", "vec_id", k=5).toPandas()
    approx = similarity.ivf_topk(
        emb, queries, "embedding", "vec_id", k=5, n_lists=8, nprobe=4
    ).toPandas()
    e = set(zip(exact.query_id, exact.cand_id))
    a = set(zip(approx.query_id, approx.cand_id))
    recall = len(e & a) / len(e)
    # k-means centroids (vs the old first-k-by-id) lift this from 0.68
    # to 0.92 on the fixture — keep the bar at 0.9
    assert recall >= 0.9, f"IVF recall {recall:.2f} too low (nprobe=4/8 lists)"
    # approx similarities are genuine (subset of exact values for shared pairs)
    merged = exact.merge(approx, on=["query_id", "cand_id"], suffixes=("_e", "_a"))
    assert np.allclose(merged.sim_e, merged.sim_a)


def test_hyperplane_lsh_recall(spark):
    """Sign-LSH must recover planted near-duplicate neighbors (high
    cosine → near-certain bucket collision) and report genuine sims."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    exact = similarity.cosine_topk(emb, queries, "embedding", "vec_id", k=1).toPandas()
    approx = similarity.hyperplane_lsh_topk(
        emb, queries, "embedding", "vec_id", k=1, n_bits=4, n_tables=16
    ).toPandas()
    # at 4 bits (16 buckets), the single nearest neighbor should be
    # found for a majority of queries on clustered embeddings
    merged = exact.merge(approx, on="query_id", suffixes=("_e", "_a"))
    recall = (merged.cand_id_e == merged.cand_id_a).mean()
    assert recall >= 0.7, f"LSH top-1 recall {recall:.2f}"
    # reported similarities are the true cosines
    both = exact.merge(approx, on=["query_id", "cand_id"], suffixes=("_e", "_a"))
    if len(both):
        assert np.allclose(both.sim_e, both.sim_a)


def test_dtype_overrides_at_ingest(spark, tmp_path):
    """Reference parity: the ingest `dtypes=` override path
    (partitioner.py:26-37, notebook cell 3)."""
    from lsd2_spark.catalog import partition_catalog

    pdf = pd.DataFrame(
        {
            "sid": np.arange(100, dtype=np.int64),
            "ra": np.linspace(0, 359, 100),
            "dec": np.linspace(-80, 80, 100),
            "mag": np.linspace(10, 20, 100),
            "flag": np.arange(100) % 2,
        }
    )
    cat = partition_catalog(
        spark.createDataFrame(pdf), str(tmp_path / "d"), "d",
        ra_col="ra", dec_col="dec", id_col="sid",
        threshold=50, order_k=5, write_margins=False,
        dtype_overrides={"mag": "float", "flag": "string"},
    )
    schema = {f.name: f.dataType.simpleString() for f in cat.df().schema.fields}
    assert schema["mag"] == "float"
    assert schema["flag"] == "string"


def test_winnow_fingerprint_detects_duplicates(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "the quick brown fox jumps over the lazy dog many times today",
                "the quick brown fox jumps over the lazy dog many times today",  # dup
                "completely different content with other words entirely here",
            ],
        }
    )
    out = (
        text_analysis.winnow_fingerprint(spark.createDataFrame(pdf), "text", "doc_id")
        .toPandas()
        .set_index("doc_id")["winnow_min"]
    )
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_winnow_empty_and_short_text(spark):
    pdf = pd.DataFrame({"doc_id": [1, 2], "text": ["abc", ""]})
    out = text_analysis.winnow_fingerprint(
        spark.createDataFrame(pdf), "text", "doc_id"
    ).toPandas()
    assert (out["winnow_min"] == 0).all()  # shorter than k-gram → sentinel


def test_multimodal_feature_plumbing(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    blobs = multimodal.to_blob_table(docs, "text", "doc_id", "text/fake")
    feats = multimodal.extract_features(blobs).toPandas()
    assert len(feats) == docs.count()
    assert (feats["n_bytes"] > 0).all()
    assert ((feats["feat_entropy"] >= 0) & (feats["feat_entropy"] <= 8)).all()
    assert feats["sketch"].str.len().eq(16).all()


def test_decode_rejects_unsupported():
    with pytest.raises(ValueError):
        multimodal.decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")
    with pytest.raises(ValueError):  # PNG magic but truncated stream
        multimodal.decode_image(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):  # PPM magic but text, not an image
        multimodal.decode_image(b"P6 is a chess piece, not a pixmap")


def test_png_codec_roundtrip():
    from lsd2_spark.sources import imagecodec as ic

    rng = np.random.default_rng(5)
    for shape in [(7, 5), (8, 8, 3), (4, 9, 4), (1, 1), (3, 2, 2)]:
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = ic.decode_png(ic.encode_png(arr))
        want = arr if arr.ndim == 3 else arr[:, :, None]
        assert out.shape == want.shape
        assert (out == want).all()


def test_png_decoder_handles_all_filters():
    """Hand-build PNGs using each row filter (Sub/Up/Average/Paeth) and
    check the decoder reconstructs the original pixels — our encoder
    only emits filter 0, so this exercises the defilter paths a PNG
    from any real encoder would use."""
    import struct
    import zlib

    from lsd2_spark.sources import imagecodec as ic

    rng = np.random.default_rng(6)
    arr = rng.integers(0, 256, size=(6, 4, 3), dtype=np.uint8)
    h, w, ch = arr.shape
    flat = arr.reshape(h, w * ch).astype(np.int32)

    for filt in [1, 2, 3, 4]:
        rows = bytearray()
        for y in range(h):
            cur = flat[y]
            prev = flat[y - 1] if y else np.zeros(w * ch, dtype=np.int32)
            enc = np.zeros(w * ch, dtype=np.int32)
            for i in range(w * ch):
                a = cur[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                if filt == 1:
                    pred = a
                elif filt == 2:
                    pred = b
                elif filt == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (cur[i] - pred) & 0xFF
            rows.append(filt)
            rows.extend(enc.astype(np.uint8).tobytes())

        def chunk(ctype, body):
            crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
            return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

        png = (
            ic.PNG_SIGNATURE
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(rows)))
            + chunk(b"IEND", b"")
        )
        out = ic.decode_png(png)
        assert (out == arr).all(), f"filter {filt} mis-decoded"


def test_ppm_codec():
    from lsd2_spark.sources import imagecodec as ic

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(10, 16, 3), dtype=np.uint8)
    ppm = b"P6\n# a comment\n16 10\n255\n" + arr.tobytes()
    assert (ic.decode_ppm(ppm) == arr).all()
    gray = rng.integers(0, 256, size=(3, 5, 1), dtype=np.uint8)
    pgm = b"P5 5 3 255\n" + gray.tobytes()
    assert (ic.decode_ppm(pgm) == gray).all()


def test_extract_features_uses_real_pixels(spark):
    """PNG payloads must produce PIXEL statistics (≠ statistics of the
    compressed bytes), and unsupported payloads fall back to byte
    statistics."""
    from lsd2_spark.sources import imagecodec as ic

    rng = np.random.default_rng(8)
    imgs = [rng.integers(0, 256, size=(12, 9, 3), dtype=np.uint8) for _ in range(4)]
    rows = [(i, ic.encode_png(img)) for i, img in enumerate(imgs)]
    rows.append((99, b"\xff\xd8 not an image"))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    blobs = multimodal.to_blob_table(df, "payload", "media_id", "image/png")
    feats = (
        multimodal.extract_features(blobs)
        .toPandas()
        .set_index("media_id")
        .sort_index()
    )
    for i, img in enumerate(imgs):
        pix = img.ravel()
        assert feats.loc[i, "feat_mean"] == pytest.approx(round(float(pix.mean()), 6))
        cnt = np.bincount(pix, minlength=256) / pix.size
        nz = cnt[cnt > 0]
        want_ent = round(float(-(nz * np.log2(nz)).sum()), 6)
        assert feats.loc[i, "feat_entropy"] == pytest.approx(want_ent)
        # and these differ from the compressed-byte statistics
        comp = np.frombuffer(ic.encode_png(img), dtype=np.uint8)
        assert feats.loc[i, "feat_mean"] != pytest.approx(round(float(comp.mean()), 6))
    raw = np.frombuffer(b"\xff\xd8 not an image", dtype=np.uint8)
    assert feats.loc[99, "feat_mean"] == pytest.approx(round(float(raw.mean()), 6))


def test_lsh_finds_planted_near_duplicates(spark):
    base = "spark catalyst shuffle partition broadcast join aggregate window sort merge scan filter"
    docs = []
    for i in range(50):
        docs.append((i, f"doc {i} " + " ".join(f"tok{i}_{j}" for j in range(30))))
    # two planted near-duplicate pairs (share most tokens)
    docs.append((100, base + " extra1"))
    docs.append((101, base + " extra2"))
    pdf = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    pairs = dedup.lsh_candidate_pairs(pdf, "text", "doc_id").toPandas()
    assert ((pairs.id1 == 100) & (pairs.id2 == 101)).any()
    est = pairs.loc[(pairs.id1 == 100) & (pairs.id2 == 101), "jaccard_est"].iloc[0]
    assert est >= 0.5


def test_simhash_hamming_reflects_similarity(spark):
    base = " ".join(f"w{j}" for j in range(60))
    pdf = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [base, base + " extra", " ".join(f"z{j}" for j in range(60))],
            }
        )
    )
    out = dedup.simhash(pdf, "text", "doc_id", bits=60).toPandas().set_index("doc_id")["simhash"]

    def ham(a, b):
        return bin(int(a) ^ int(b)).count("1")

    assert ham(out[1], out[2]) < ham(out[1], out[3])


def test_lsh_rejects_overflowing_band_configs(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="rows/band"):
        dedup.lsh_candidate_pairs(df, "text", "doc_id", bands=2)
    with pytest.raises(ValueError, match="divide"):
        dedup.lsh_candidate_pairs(df, "text", "doc_id", bands=3)


def test_embedding_neardup_recall_and_precision(spark):
    """LSH-bucketed near-dup pairs: every reported pair is a true
    >=threshold pair (exact cosine re-check), and recall vs the exact
    all-pairs set is high."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = similarity.embedding_neardup_pairs(
        emb, "embedding", "vec_id", threshold=0.4
    ).toPandas()

    pdf = emb.select("vec_id", "embedding").toPandas()
    m = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    ids = pdf["vec_id"].to_numpy()
    iu = np.triu_indices(len(ids), k=1)
    true_mask = np.round(sims[iu], 6) >= 0.4
    true_pairs = {
        (min(a, b), max(a, b))
        for a, b in zip(ids[iu[0]][true_mask], ids[iu[1]][true_mask])
    }
    got_pairs = set(zip(got["id1"].astype(int), got["id2"].astype(int)))
    assert got_pairs <= true_pairs  # precision 1.0 (exact post-filter)
    recall = len(got_pairs) / max(len(true_pairs), 1)
    assert recall >= 0.8, f"near-dup recall {recall:.2f}"


def test_ivf_centroid_reuse(spark):
    """Prebuilt centroids reproduce the self-built result exactly (the
    build-once / search-many index pattern)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    cents = similarity.kmeans_centroids(emb, "embedding", "vec_id", 8, n_iters=2)
    a = similarity.ivf_topk(
        emb, queries, "embedding", "vec_id", k=5, n_lists=8, nprobe=4
    ).toPandas().sort_values(["query_id", "rnk"], ignore_index=True)
    b = similarity.ivf_topk(
        emb, queries, "embedding", "vec_id", k=5, n_lists=8, nprobe=4, centroids=cents
    ).toPandas().sort_values(["query_id", "rnk"], ignore_index=True)
    assert a.equals(b)


def test_dedup_clusters_match_union_find(spark):
    """Connected components via min-label propagation must equal a
    union-find ground truth on the fixture, and one extra propagation
    step must change nothing (n_steps covers the diameter)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    edges = dedup.lsh_candidate_pairs(docs, "text", "doc_id").filter(
        F.col("jaccard_est") >= 0.9
    )
    e = edges.select("id1", "id2").toPandas()
    ids = docs.select("doc_id").toPandas()["doc_id"].astype(int).tolist()
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(e["id1"].astype(int), e["id2"].astype(int)):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth = {i: find(i) for i in ids}

    got = (
        dedup.dedup_clusters(docs, "text", "doc_id", min_jaccard=0.9, n_steps=4)
        .toPandas()
        .set_index("doc_id")
    )
    assert {int(i): int(c) for i, c in got["cluster_id"].items()} == truth
    assert int(got["is_canonical"].sum()) == len(set(truth.values()))

    # one more step is a no-op → 4 steps reached the fixpoint
    more = (
        dedup.dedup_clusters(docs, "text", "doc_id", min_jaccard=0.9, n_steps=5)
        .toPandas()
        .set_index("doc_id")["cluster_id"]
    )
    assert more.sort_index().equals(got["cluster_id"].sort_index())


def test_similarity_ops_drop_null_vectors(spark):
    """Null embeddings are excluded from indexing, search, and pairs
    (not crashes, not null-scored rows)."""
    edf = spark.createDataFrame(pd.DataFrame({"vec_id": [1, 2, 3, 4]})).withColumn(
        "embedding",
        F.when(
            F.col("vec_id") < 4,
            F.array(*[(F.col("vec_id") * 0.1 + F.lit(i * 0.01)) for i in range(8)]),
        ).otherwise(F.lit(None)),
    )
    q = edf.filter(F.col("vec_id") == 1)
    nd = similarity.embedding_neardup_pairs(
        edf, "embedding", "vec_id", threshold=-1.0, n_bits=2, n_tables=2
    ).toPandas()
    assert 4 not in set(nd.id1) | set(nd.id2) and len(nd) == 3
    for fn in (
        lambda: similarity.cosine_topk(edf, q, "embedding", "vec_id", k=2),
        lambda: similarity.hyperplane_lsh_topk(edf, q, "embedding", "vec_id", k=2, n_bits=2, n_tables=2),
        lambda: similarity.ivf_topk(edf, q, "embedding", "vec_id", k=2, n_lists=2, nprobe=2),
    ):
        out = fn().toPandas()
        assert 4 not in set(out.cand_id)
        assert out["sim"].notna().all()


def test_deterministic_sampling_reproducible_and_proportional(spark):
    """Sampling/splits depend only on ids: re-runs are identical, and
    observed rates track the requested fractions on a large draw."""
    from lsd2_spark.operators import sampling

    df = spark.range(0, 20_000).withColumnRenamed("id", "doc_id")
    a = sampling.stratified_sample(df, "doc_id", 0.3).toPandas()
    b = sampling.stratified_sample(df, "doc_id", 0.3).toPandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert abs(len(a) / 20_000 - 0.3) < 0.02

    s = sampling.assign_splits(df, "doc_id").toPandas()
    rates = s["split"].value_counts(normalize=True)
    assert abs(rates["train"] - 0.9) < 0.02
    assert abs(rates.get("val", 0) - 0.05) < 0.01
    assert abs(rates.get("test", 0) - 0.05) < 0.01
    # a different salt draws a different (but still deterministic) sample
    c = sampling.stratified_sample(df, "doc_id", 0.3, salt="v2").toPandas()
    assert c["doc_id"].tolist() != a["doc_id"].tolist()


def test_training_pipeline_example(spark):
    """The composed pipeline (quality → lang → exact dedup → fuzzy
    dedup → mixing → splits → accounting) runs end-to-end and its
    stages actually filter."""
    import sys as _sys
    _sys.path.insert(0, "/root/repo")
    from examples.training_pipeline import build_training_corpus, token_accounting

    from pyspark.sql import functions as SF

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = build_training_corpus(
        spark, docs, quality_cutoff=30,
        eval_docs=docs.filter(SF.col("doc_id") % 20 == 0),
    )
    n_in, n_out = docs.count(), corpus.count()
    assert 0 < n_out < n_in
    # the eval docs themselves are self-contaminated by construction
    assert corpus.filter(SF.col("doc_id") % 20 == 0).count() == 0
    acct = token_accounting(corpus).toPandas().set_index("split")
    assert acct["n_docs"].sum() == n_out
    assert (acct["n_bpe_tokens"] > 0).all()
    assert set(acct.index) <= {"train", "val", "test"}

    from examples.training_pipeline import packing

    manifest = packing.pack_sequences(
        corpus.filter("split = 'train'"), "doc_id",
        SF.size(SF.split(SF.col("text"), r"\s+")), 512, "source",
    ).toPandas()
    assert len(manifest) > 0 and (manifest["n_tokens"] > 0).all()


def test_training_pipeline_round7_stages(spark):
    """The round-7 stages compose: substring scrub, model quality gate,
    and the token-budget mixture all run inside the pipeline and shape
    the corpus as specified."""
    import sys as _sys
    _sys.path.insert(0, "/root/repo")
    from examples.training_pipeline import build_training_corpus

    from pyspark.sql import functions as SF

    from lsd2_spark.operators.quality_model import train_quality_model

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    qm = train_quality_model(
        docs.filter(SF.length("text") > 300),
        docs.filter(SF.length("text") <= 150),
    )
    budget = 20_000
    corpus = build_training_corpus(
        spark, docs, quality_cutoff=0,
        scrub_repeated_spans=True, min_span_tokens=8,
        quality_model=qm, min_quality_prob=0.05,
        token_budget=budget, max_epochs=4.0,
    )
    corpus.cache()
    assert corpus.count() > 0
    # token-budget mixture: realized tokens within binomial noise of
    # min(budget, 4 epochs of everything)
    tok = SF.size(SF.split(SF.col("text"), r"\s+"))
    realized = corpus.agg(SF.sum(tok)).collect()[0][0]
    assert realized <= budget * 1.15
    assert realized >= budget * 0.5  # the corpus is big enough to fill most of it
    # epoch-replicated corpora: (doc_id, epoch) unique, epoch kept
    assert "epoch" in corpus.columns
    assert (
        corpus.select("doc_id", "epoch").distinct().count() == corpus.count()
    )
    # token_accounting must count each corpus ROW once, not square the
    # totals for replicated docs (one stats row per distinct doc)
    from examples.training_pipeline import token_accounting as acct_fn

    acct = acct_fn(corpus).toPandas()
    assert acct["n_docs"].sum() == corpus.count()
    corpus.unpersist()


def test_training_pipeline_round8_stages(spark):
    """The round-8 stages compose: boilerplate line-dedup strips a
    planted footer before scoring, SemDeDup kills planted paraphrase
    pairs textual dedup misses, and DSIR selection bounds the corpus."""
    import sys as _sys
    _sys.path.insert(0, "/root/repo")
    from examples.training_pipeline import build_training_corpus

    from pyspark.sql import functions as SF

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    footer = "COPYRIGHT FOOTER PLANTED FOR TEST"
    planted = docs.withColumn(
        "text",
        SF.when(
            SF.col("doc_id") % 2 == 0,
            SF.concat(SF.col("text"), SF.lit("\n" + footer)),
        ).otherwise(SF.col("text")),
    )
    target = docs.filter(SF.col("doc_id") % 9 == 1).select("doc_id", "text")
    # eval set + planted EDITED eval leaks (every 6th word swapped —
    # invisible to exact 5-grams, caught by the fuzzy stage)
    eval_docs = docs.filter(SF.col("doc_id") % 11 == 2).limit(10).select(
        "doc_id", "text"
    )
    edited_leaks = eval_docs.select(
        (SF.col("doc_id") + 7_000_000).alias("doc_id"),
        SF.concat_ws(
            " ",
            SF.transform(
                SF.split("text", r"[ \t\n\r\f]+"),
                lambda t, i: SF.when(i % 6 == 0, SF.lit("EDITW")).otherwise(t),
            ),
        ).alias("text"),
        SF.lit("en").alias("lang"),
        SF.lit("srcX").alias("source"),
        SF.length("text").alias("n_chars"),
    )
    planted = planted.unionByName(edited_leaks.select(*planted.columns))
    corpus = build_training_corpus(
        spark,
        planted,
        quality_cutoff=0,
        boilerplate_min_docs=5,
        semantic_eps=0.995,
        semantic_clusters=8,
        dsir_target=target,
        dsir_n=50,
        eval_docs=eval_docs,
        fuzzy_decontam_jaccard=0.2,
    )
    corpus.cache()
    n_out = corpus.count()
    assert 0 < n_out <= 50  # DSIR selection bound
    # the planted boilerplate never reaches the output corpus
    assert corpus.filter(SF.col("text").contains(footer)).count() == 0
    # neither do the edited eval leaks (fuzzy decontam) nor the eval
    # docs themselves (exact decontam)
    assert corpus.filter(SF.col("doc_id") >= 7_000_000).count() == 0
    corpus.unpersist()


def test_connected_components_long_chain_converges(spark):
    """A chain-shaped component (diameter >> 4) must fully merge: the
    fixpoint loop keeps going until no label changes, while a
    fixed-4-round cap under-merges and must WARN about it."""
    n = 12
    verts = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id1 long, id2 long"
    )

    got = dedup.connected_components(verts, chain, "doc_id").toPandas()
    assert (got["cluster_id"] == 0).all()  # one component, min label 0

    with pytest.warns(UserWarning, match="round cap"):
        capped = dedup.connected_components(
            verts, chain, "doc_id", n_steps=4
        ).toPandas()
    # 4 rounds reach only the 4-hop neighborhood: the chain tail keeps
    # a non-zero label — exactly the silent under-merge the cap now warns on
    assert (capped["cluster_id"] != 0).any()


def test_lsh_hot_bucket_aqe_skew_split(spark):
    """Mega-duplicate-cluster skew: 100 identical docs (20% of the
    corpus) all land in ONE (band, bucket) key of the LSH self-join.
    With sort-merge forced and test-scale AQE skew thresholds, the
    executed plan must show AQE splitting the hot partition
    (skew=true) — the mechanism that keeps one straggler task from
    owning the stage at 100 TB."""
    rows = [(i, f"doc {i} " + " ".join(f"t{i}_{j}" for j in range(25)))
            for i in range(400)]
    mega = "all these tokens are identical across the mega cluster " * 3
    rows += [(1000 + i, mega + f" tail{i % 3}") for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)

    conf = spark.conf
    saved = {k: conf.get(k, None) for k in [
        "spark.sql.shuffle.partitions",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.enabled",
    ]}
    try:
        conf.set("spark.sql.shuffle.partitions", "8")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        pairs = dedup.lsh_candidate_pairs(docs, "text", "doc_id")
        # collect() executes THIS DataFrame's QueryExecution, so the
        # adaptive plan below is the final, post-execution one
        # (count() would run a separate aggregated execution)
        n = len(pairs.collect())
        assert n >= 100_000  # the mega cluster dominates the pair set
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:4000]
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_wav_codec_roundtrip():
    from lsd2_spark.sources import audiocodec as ac

    rng = np.random.default_rng(9)
    sig = rng.uniform(-0.9, 0.9, 400)
    # 16-bit mono
    dec, rate = ac.decode_wav(ac.encode_wav(sig, 22_050, bits=16))
    assert rate == 22_050 and dec.shape == (400, 1)
    assert np.allclose(dec[:, 0], sig, atol=1 / 32768)
    # 8-bit stereo
    st = rng.uniform(-0.9, 0.9, (200, 2))
    dec8, rate8 = ac.decode_wav(ac.encode_wav(st, 8_000, bits=8))
    assert rate8 == 8_000 and dec8.shape == (200, 2)
    assert np.allclose(dec8, st, atol=1 / 128)
    with pytest.raises(ValueError):
        ac.decode_wav(b"RIFFxxxxJUNK")
    with pytest.raises(ValueError):
        ac.decode_wav(b"not audio at all")


def test_audio_features_real_signal(spark):
    """A pure tone must yield the analytically-known features: RMS of
    A*sin = A/sqrt(2), ZCR = 2f/rate, spectral centroid ≈ f."""
    from lsd2_spark.sources import audiocodec as ac

    rate, n, f, amp = 16_000, 4_000, 440.0, 0.5
    t = np.arange(n) / rate
    tone = amp * np.sin(2 * np.pi * f * t)
    rows = [(1, ac.encode_wav(tone, rate, bits=16)),
            (2, b"definitely not audio")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    blobs = multimodal.to_blob_table(df, "payload", "media_id", "audio/wav")
    out = (
        multimodal.extract_audio_features(blobs)
        .toPandas()
        .set_index("media_id")
        .sort_index()
    )
    assert out.loc[1, "n_frames"] == n and out.loc[1, "sample_rate"] == rate
    assert out.loc[1, "amp_rms"] == pytest.approx(amp / np.sqrt(2), rel=1e-3)
    assert out.loc[1, "zcr"] == pytest.approx(2 * f / rate, rel=0.02)
    assert out.loc[1, "spectral_centroid"] == pytest.approx(f, rel=0.05)
    assert pd.isna(out.loc[2, "n_frames"])  # non-WAV → nulls, no crash


def test_resize_images_real_pixels(spark):
    from lsd2_spark.sources import imagecodec as ic

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(10, 16, 3), dtype=np.uint8)
    rows = [(1, ic.encode_png(img)), (2, ic.encode_ppm(img)),
            (3, b"not an image")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    blobs = multimodal.to_blob_table(df, "payload", "media_id", "image/mixed")
    out = (
        multimodal.resize_images(blobs, width=8, height=5, out_format="ppm")
        .toPandas().set_index("media_id").sort_index()
    )
    want = img[(np.arange(5) * 10) // 5][:, (np.arange(8) * 16) // 8]
    for mid in (1, 2):  # PNG and PPM inputs resize to identical pixels
        got = ic.decode_ppm(bytes(out.loc[mid, "payload"]))
        assert got.shape == (5, 8, 3)
        assert (got == want).all()
        assert out.loc[mid, "width"] == 8 and out.loc[mid, "height"] == 5
    assert out.loc[3, "payload"] is None  # kept, null payload


def test_sample_frames_ppm_stream(spark):
    from lsd2_spark.sources import imagecodec as ic

    rng = np.random.default_rng(12)
    frames = [rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
              for _ in range(5)]
    stream = b"".join(ic.encode_ppm(f) for f in frames)
    assert len(ic.decode_ppm_stream(stream)) == 5  # codec-level roundtrip
    df = spark.createDataFrame(
        [(7, stream), (8, b"junk")], "media_id long, payload binary"
    )
    blobs = multimodal.to_blob_table(df, "payload", "media_id", "video/x-ppm-stream")
    out = (
        multimodal.sample_frames(blobs, every_n=2)
        .toPandas().sort_values("frame_idx", ignore_index=True)
    )
    assert list(out["media_id"]) == [7, 7, 7]  # junk yields no rows
    assert list(out["frame_idx"]) == [0, 2, 4]
    for _, row in out.iterrows():
        fr = frames[int(row["frame_idx"])]
        assert (ic.decode_ppm(bytes(row["payload"])) == fr).all()
        assert row["frame_mean"] == pytest.approx(fr.astype(float).mean())


def test_media_ops_handle_empty_and_null_payloads(spark):
    """Zero-row inputs (empty Arrow batches) and NULL/empty payloads
    must flow through every media operator without crashing — a NULL
    payload has NULL n_bytes, which the feature schema must allow."""
    empty = spark.createDataFrame([], "media_id long, payload binary")
    nulls = spark.createDataFrame(
        [(1, None), (2, b"")], "media_id long, payload binary"
    )
    for src, want_feat_rows in [(empty, 0), (nulls, 2)]:
        blobs = multimodal.to_blob_table(src, "payload", "media_id", "t")
        assert multimodal.extract_features(blobs).count() == want_feat_rows
        assert multimodal.extract_audio_features(blobs).count() == want_feat_rows
        assert multimodal.resize_images(blobs, 4, 4).count() == want_feat_rows
        assert multimodal.sample_frames(blobs, 1).count() == 0  # no frames
    f = multimodal.extract_features(
        multimodal.to_blob_table(nulls, "payload", "media_id", "t")
    ).toPandas().set_index("media_id")
    assert pd.isna(f.loc[1, "n_bytes"])  # NULL payload → NULL length
    assert f.loc[2, "feat_mean"] == 0.0  # empty payload → zero features


def test_similarity_ops_total_over_invalid_vectors(spark):
    """NULL, empty, zero-norm, and wrong-dimension vectors must be
    filtered out — not crash the cosine (0/0) or the Arrow kernels
    (ragged stack) — and the valid vectors still rank correctly."""
    rows = [(1, [1.0, 0.0, 0.0]), (2, [0.9, 0.1, 0.0]), (3, None), (4, []),
            (5, [0.0, 0.0, 0.0]), (6, [0.5, 0.5, 0.0]), (7, [1.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter("vec_id = 1")

    exact = similarity.cosine_topk(emb, q, "embedding", "vec_id", k=5).toPandas()
    assert set(exact["cand_id"]) == {2, 6}  # only valid, same-dim candidates
    assert exact.sort_values("rnk")["cand_id"].tolist() == [2, 6]

    approx = similarity.ivf_topk(
        emb, q, "embedding", "vec_id", k=5, n_lists=2, nprobe=2
    ).toPandas()
    assert set(approx["cand_id"]) <= {2, 6} and len(approx)

    lsh = similarity.hyperplane_lsh_topk(
        emb, q, "embedding", "vec_id", k=5, n_bits=2, n_tables=4
    ).toPandas()
    assert set(lsh["cand_id"]) <= {2, 6}

    pairs = similarity.embedding_neardup_pairs(
        emb, "embedding", "vec_id", threshold=0.8
    ).toPandas()
    assert {3, 4, 5, 7}.isdisjoint(set(pairs["id1"]) | set(pairs["id2"]))

    # an all-invalid corpus yields empty results, not a crash
    bad = spark.createDataFrame(
        [(1, None), (2, [])], "vec_id long, embedding array<double>"
    )
    assert similarity.hyperplane_lsh_topk(bad, bad, "embedding", "vec_id").count() == 0
    assert similarity.embedding_neardup_pairs(bad, "embedding", "vec_id").count() == 0
    assert similarity.ivf_topk(bad, bad, "embedding", "vec_id").count() == 0


def test_kmv_distinct_accuracy_and_exact_path(spark):
    """KMV bottom-k sketch: groups under k are EXACT; larger groups
    estimate within the standard ~1/sqrt(k) relative error; results
    are independent of input partitioning (the partial bottom-k is
    lossless for the global sketch)."""
    from lsd2_spark.operators.sketches import kmv_distinct

    rows = [("small", i) for i in range(10)]
    rows += [("big", i) for i in range(5000)]
    rows += [("big", i) for i in range(2500)]  # duplicates must not inflate
    df = spark.createDataFrame(rows, "grp string, v long")

    out = kmv_distinct(df, "v", ["grp"], k=256).toPandas().set_index("grp")
    assert out.loc["small", "n_kept"] == 10
    assert out.loc["small", "est_distinct"] == 10.0  # exact below k
    est = out.loc["big", "est_distinct"]
    assert abs(est - 5000) / 5000 < 4 / np.sqrt(256), est  # ~4 sigma

    # partitioning-independence: same sketch from a different layout
    out2 = (
        kmv_distinct(df.repartition(17), "v", ["grp"], k=256)
        .toPandas().set_index("grp")
    )
    assert out2.loc["big", "est_distinct"] == est
    assert out2.loc["small", "est_distinct"] == 10.0


def test_weighted_sample_proportional_and_reproducible(spark):
    """A-Res weighted sampling: inclusion probability tracks weight
    (100x-weight rows dominate a 10% sample), results are identical
    across re-runs and partitionings, and invalid weights are excluded."""
    from lsd2_spark.operators.sampling import weighted_sample

    rows = [(i, "light", 1.0) for i in range(1000)]
    rows += [(1000 + i, "heavy", 100.0) for i in range(1000)]
    rows += [(9001, "bad", 0.0), (9002, "bad", None)]
    df = spark.createDataFrame(rows, "doc_id long, kind string, wt double")

    got = weighted_sample(df, "doc_id", "wt", 200).toPandas()
    assert len(got) == 200
    assert not (got["kind"] == "bad").any()
    # heavy rows are 100x more likely: expect >=85% of the sample
    assert (got["kind"] == "heavy").mean() > 0.85

    again = weighted_sample(df.repartition(13), "doc_id", "wt", 200).toPandas()
    assert set(got["doc_id"]) == set(again["doc_id"])  # fully deterministic

    strat = weighted_sample(df, "doc_id", "wt", 50, strata_col="kind").toPandas()
    assert strat.groupby("kind").size().to_dict() == {"bad": 0, "heavy": 50, "light": 50} or \
           strat.groupby("kind").size().to_dict() == {"heavy": 50, "light": 50}


def test_normalized_dedup_catches_formatting_variants(spark):
    rows = [
        (1, "Hello, World!  How are you?"),
        (2, "hello world how are you"),        # same after normalization
        (3, "HELLO   world,  how ARE you??"),  # same after normalization
        (4, "entirely different content"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = dedup.exact_dedup(df, "text", "doc_id").toPandas()
    assert exact["is_canonical"].sum() == 4  # exact dedup sees 4 distinct
    norm = dedup.normalized_dedup(df, "text", "doc_id").toPandas().set_index("doc_id")
    assert norm["is_canonical"].sum() == 2   # normalization collapses 1-3
    assert norm.loc[2, "canonical_id"] == 1 and norm.loc[3, "canonical_id"] == 1


def test_cap_per_stratum_quota_and_determinism(spark):
    from lsd2_spark.operators.sampling import cap_per_stratum

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    got = cap_per_stratum(df, "doc_id", "src", 50).toPandas()
    sizes = got.groupby("src").size().to_dict()
    assert sizes == {"big": 50, "small": 50}  # big capped, small under cap
    again = cap_per_stratum(df.repartition(11), "doc_id", "src", 50).toPandas()
    assert set(got["doc_id"]) == set(again["doc_id"])  # deterministic


def test_ivf_index_roundtrips_and_serves(spark, tmp_path):
    """save/load of the IVF centroid table must be exact, and a loaded
    index must serve identical top-k to the in-memory one."""
    import numpy as np

    from lsd2_spark.operators.similarity import (
        ivf_topk, kmeans_centroids, load_ivf_index, save_ivf_index,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = kmeans_centroids(emb, "embedding", "vec_id", n_lists=8, n_iters=1)
    p = str(tmp_path / "ivf.parquet")
    save_ivf_index(cents, p)
    loaded = load_ivf_index(p)
    assert np.array_equal(cents, loaded)

    q = emb.limit(20)
    a = ivf_topk(emb, q, "embedding", "vec_id", k=3, n_lists=8, nprobe=2,
                 centroids=cents).toPandas().sort_values(["query_id", "rnk"])
    b = ivf_topk(emb, q, "embedding", "vec_id", k=3, n_lists=8, nprobe=2,
                 centroids=loaded).toPandas().sort_values(["query_id", "rnk"])
    assert a.values.tolist() == b.values.tolist() and len(a) > 0


def test_kmeans_assign_matches_build_assignment(spark):
    """kmeans_assign must reproduce the build's own assignment rule and
    be total over null/ragged vectors (NULL cluster, row kept)."""
    import numpy as np

    from lsd2_spark.operators.similarity import kmeans_assign, kmeans_centroids

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = kmeans_centroids(emb, "embedding", "vec_id", n_lists=4, n_iters=1)
    got = kmeans_assign(emb, "embedding", "vec_id", cents).toPandas()
    assert len(got) == emb.count()
    assert got["cluster_id"].notna().all()

    # python reference on a sample
    sample = emb.limit(50).toPandas()
    m = np.round(np.stack([np.asarray(v, dtype=np.float64) for v in sample["embedding"]]), 6)
    d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    ref = np.argmin(np.round(d2, 6), axis=1)
    gm = got.set_index("vec_id").loc[sample["vec_id"]]["cluster_id"].to_numpy()
    assert (gm == ref).all()

    from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType
    bad = spark.createDataFrame(
        [(1, None), (2, [1.0, 2.0])],
        StructType([StructField("vec_id", LongType()), StructField("embedding", ArrayType(FloatType()))]),
    )
    b = {r["vec_id"]: r["cluster_id"] for r in kmeans_assign(bad, "embedding", "vec_id", cents).collect()}
    assert b[1] is None and b[2] is None  # null + wrong-dim -> NULL, kept


def test_profile_table_one_pass(spark):
    from lsd2_spark.operators.sketches import profile_table

    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 1.5), (3, "a", 2.5), (4, None, 3.5)],
        "id long, s string, v double",
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["id"]["null_frac"] == 0.0 and prof["id"]["approx_distinct"] == 4
    assert prof["s"]["null_frac"] == 0.25 and prof["s"]["approx_distinct"] == 2
    assert prof["v"]["null_frac"] == 0.25
    assert prof["id"]["min"] == "1" and prof["id"]["max"] == "4"
    assert prof["s"]["dtype"] == "string"

    # real corpus smoke: one row per column, sane fractions
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    p = profile_table(docs).toPandas()
    assert set(p["column"]) == set(docs.columns)
    assert ((p["null_frac"] >= 0) & (p["null_frac"] <= 1)).all()


def test_temperature_mixture_tempers_source_shares(spark):
    """alpha=1 keeps natural proportions; alpha<1 shifts share toward
    small sources; the mixture is deterministic and the fractions
    reproducible."""
    from lsd2_spark.operators.sampling import temperature_mixture

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    flat, fr1 = temperature_mixture(df, "doc_id", "source", alpha=1.0)
    assert fr1["big"] == pytest.approx(1.0) and fr1["small"] == pytest.approx(1.0)

    temp, fr = temperature_mixture(df, "doc_id", "source", alpha=0.5)
    # small source keeps everything; big source is down-sampled
    assert fr["small"] == pytest.approx(1.0)
    assert fr["big"] < 0.5
    pdf = temp.groupBy("source").count().toPandas().set_index("source")["count"]
    assert pdf["small"] == 100  # fraction 1.0 -> all kept
    # big share after tempering ~ sqrt(900)/ (sqrt(900)+sqrt(100)) = 0.75
    got_share = pdf["big"] / (pdf["big"] + pdf["small"])
    assert 0.6 < got_share < 0.85
    # deterministic: re-run identical
    again, fr_again = temperature_mixture(df, "doc_id", "source", alpha=0.5)
    assert fr == fr_again
    assert sorted(r["doc_id"] for r in again.collect()) == sorted(
        r["doc_id"] for r in temp.collect()
    )

    capped, frc = temperature_mixture(df, "doc_id", "source", alpha=0.5, target_rows=200)
    assert capped.count() < 320  # expected ~200 with hash variance


def test_temperature_mixture_frac_round(spark):
    """frac_round snaps fractions to the floor(f*10^k+0.5)/10^k grid —
    the cross-engine replay contract — and the kept set is exactly the
    rounded-fraction stratified sample."""
    import math

    from lsd2_spark.operators.sampling import (
        stratified_sample,
        temperature_mixture,
    )

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    _, raw = temperature_mixture(df, "doc_id", "source", alpha=0.7, target_rows=400)
    kept, fr = temperature_mixture(
        df, "doc_id", "source", alpha=0.7, target_rows=400, frac_round=6
    )
    for s in raw:
        # the documented formula, bit-for-bit (the same idiom a DuckDB
        # oracle writes as FLOOR(f * 1000000.0 + 0.5) / 1000000.0)
        assert fr[s] == math.floor(raw[s] * 1e6 + 0.5) / 1e6
    replay = stratified_sample(df, "doc_id", fr, strata_col="source")
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in replay.collect()
    )


def test_dedup_clusters_keep_best_score(spark):
    """score_col flips canonical selection from min-id to argmax-score
    (ties to the smaller id); cluster membership is unchanged."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta", 10.0),
        (2, "alpha beta gamma delta epsilon zeta", 95.0),   # best dup
        (3, "alpha beta gamma delta epsilon zeta", 95.0),   # tie -> id 2 wins
        (4, "totally different text over here now", 50.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, quality double")

    byid = dedup.dedup_clusters(df, "text", "doc_id", min_jaccard=0.8)
    canon_byid = {r["doc_id"]: r["is_canonical"] for r in byid.collect()}
    assert canon_byid[1] == 1 and canon_byid[2] == 0

    best = dedup.dedup_clusters(
        df, "text", "doc_id", min_jaccard=0.8, score_col="quality"
    )
    canon = {r["doc_id"]: r["is_canonical"] for r in best.collect()}
    assert canon[2] == 1 and canon[1] == 0 and canon[3] == 0
    assert canon[4] == 1  # singleton keeps itself
    clusters = {r["doc_id"]: r["cluster_id"] for r in best.collect()}
    assert clusters[1] == clusters[2] == clusters[3] != clusters[4]


def test_random_project_preserves_neighborhoods(spark):
    """JL projection: deterministic, total over invalid vectors, and
    (at moderate compression) the exact top-1 neighbor survives for
    most query points."""
    import numpy as np

    from lsd2_spark.operators.similarity import random_project

    # clustered data: pure isotropic noise has NO stable neighbors in
    # 64-d (distance concentration), so test what JL actually promises
    # — preserving real structure
    rng = np.random.default_rng(12)
    centers = rng.normal(0, 1, (20, 64))
    X = np.vstack([
        c + rng.normal(0, 0.08, (6, 64)) for c in centers
    ]).astype(np.float64)
    rows = [(i, [float(x) for x in X[i]]) for i in range(len(X))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out = random_project(df, "embedding", 16)
    got = {r["vec_id"]: np.array(r["projected"]) for r in out.collect()}
    assert all(len(v) == 16 for v in got.values())

    # deterministic
    again = {r["vec_id"]: np.array(r["projected"])
             for r in random_project(df, "embedding", 16).collect()}
    assert all(np.array_equal(got[k], again[k]) for k in got)

    # neighborhood preservation: top-1 in original vs projected space
    Y = np.stack([got[i] for i in range(len(X))])
    def top1(M):
        d = ((M[:, None, :] - M[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d, np.inf)
        return d.argmin(1)
    # JL preserves structure, not exact within-cluster orderings: the
    # projected nearest neighbor must stay in the SAME CLUSTER
    cluster = np.arange(len(X)) // 6
    same = (cluster[top1(Y)] == cluster).mean()
    assert same > 0.95, same

    # totality over null/ragged
    from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType
    bad = spark.createDataFrame(
        [(0, [float(x) for x in X[0]]), (1, None), (2, [1.0, 2.0])],
        StructType([StructField("vec_id", LongType()),
                    StructField("embedding", ArrayType(DoubleType()))]),
    )
    b = {r["vec_id"]: r["projected"] for r in random_project(bad, "embedding", 8).collect()}
    assert b[0] is not None and len(b[0]) == 8
    assert b[1] is None and b[2] is None  # null + ragged -> NULL, rows kept


def test_cluster_balanced_sample_text_path(spark):
    """Three planted topics with disjoint vocab, one topic 10x
    over-represented: the balanced sample keeps the quota per cluster
    (the dominant topic can no longer swamp the selection), is
    reproducible, and each kept cluster is topic-pure."""
    from lsd2_spark.operators.sampling import cluster_balanced_sample

    vocab = {
        "astro": "telescope galaxy nebula photon redshift quasar orbit",
        "cook": "saucepan garlic simmer risotto parmesan ladle broth",
        "law": "statute plaintiff verdict appellate tort subpoena docket",
    }
    rows, i = [], 0
    for topic, words in vocab.items():
        n = 100 if topic == "astro" else 10  # astro swamps uniform sampling
        w = words.split()
        for j in range(n):
            text = " ".join(w[(j + k) % len(w)] for k in range(20))
            rows.append((i, topic, text))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, topic string, text string")

    got = cluster_balanced_sample(
        df, "doc_id", text_col="text", n_clusters=3, cap=5, n_iters=3
    ).toPandas()
    assert len(got) == 15
    assert set(got.columns) >= {"doc_id", "topic", "text", "cluster_id", "kept_rank"}
    per_cluster = got.groupby("cluster_id").size()
    assert (per_cluster == 5).all() and len(per_cluster) == 3
    # clusters are topic-pure: each kept cluster holds exactly one topic
    purity = got.groupby("cluster_id")["topic"].nunique()
    assert (purity == 1).all()
    # the dominant topic is capped to its quota, not its prevalence
    assert (got["topic"] == "astro").sum() == 5

    again = cluster_balanced_sample(
        df.repartition(7), "doc_id", text_col="text", n_clusters=3, cap=5, n_iters=3
    ).toPandas()
    assert sorted(got["doc_id"]) == sorted(again["doc_id"])


def test_cluster_balanced_sample_vec_path_total_and_nulls(spark):
    """vec_col path over the real embeddings table with a total budget,
    plus NULL-embedding totality: invalid rows form their own capped
    stratum instead of crashing or vanishing silently."""
    from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

    from lsd2_spark.operators.sampling import cluster_balanced_sample

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = cluster_balanced_sample(
        emb, "vec_id", vec_col="embedding", n_clusters=4, total=12, n_iters=1
    ).toPandas()
    assert 0 < len(got) <= 12
    assert (got.groupby("cluster_id").size() <= 3).all()

    bad = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, None), (3, None), (4, None)],
        StructType(
            [
                StructField("vec_id", LongType()),
                StructField("embedding", ArrayType(DoubleType())),
            ]
        ),
    )
    kept = cluster_balanced_sample(
        bad, "vec_id", vec_col="embedding", n_clusters=1, cap=2, n_iters=1
    ).toPandas()
    nulls = kept[kept["cluster_id"].isna()]
    assert len(nulls) == 2  # NULL stratum capped like any cluster
    assert (kept["cluster_id"].notna().sum()) == 1


def test_cluster_balanced_sample_rejects_bad_args(spark):
    import pytest as _pytest

    from lsd2_spark.operators.sampling import cluster_balanced_sample

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        cluster_balanced_sample(df, "doc_id", n_clusters=2, cap=1)  # no vectors
    with _pytest.raises(ValueError):
        cluster_balanced_sample(df, "doc_id", text_col="text", n_clusters=2)  # no quota
    with _pytest.raises(ValueError):
        cluster_balanced_sample(
            df, "doc_id", text_col="text", vec_col="text", n_clusters=2, cap=1
        )


def test_merged_probe_init_matches_two_job_path(spark):
    """The merged dim-probe + k-means-init job (_probe_dim_and_init)
    must return exactly the dim _probe_dim returns and exactly the
    init centroids the init_order="id" collect returns — including over
    ragged/null/zero-norm rows and with a sample stride."""
    from lsd2_spark.functions.numeric import round6
    from lsd2_spark.operators.similarity import (
        _probe_dim,
        _probe_dim_and_init,
        _valid_vectors,
    )

    rows = [
        (0, [1.0, 2.0, 3.0]),
        (1, None),                      # null vector
        (2, [0.0, 0.0, 0.0]),           # zero norm
        (3, [1.0, 1.0]),                # ragged (wrong dim)
        (4, [0.5, -0.25, 8.0]),
        (5, []),                        # empty
        (6, [2.0, 2.0, 2.0]),
        (7, [1.0e-7, 0.0, 1.0]),        # rounding-sensitive component
        (8, [3.0, 1.0, 2.0]),
        (9, [4.0, 4.0, 4.0]),
    ]
    df = spark.createDataFrame(rows, "vid long, v array<double>")
    for stride in (1, 2):
        dim, cents = _probe_dim_and_init(df, "v", "vid", n_lists=3,
                                         sample_stride=stride)
        assert dim == _probe_dim(df, "v")
        # the exact two-job init path
        samp = _valid_vectors(df, "v", dim).select(
            F.col("vid").alias("_vid"),
            F.transform(F.col("v"), lambda x: round6(x.cast("double"))).alias("_v"),
        )
        if stride > 1:
            samp = samp.filter(F.col("_vid") % stride == 0)
        init_rows = samp.orderBy(F.col("_vid").asc()).limit(3).collect()
        want = np.array([r["_v"] for r in init_rows], dtype=np.float64)
        assert cents is not None and np.array_equal(cents, want)

    # empty-input degenerate: no usable vector at all
    empty = spark.createDataFrame([], "vid long, v array<double>")
    assert _probe_dim_and_init(empty, "v", "vid", 3, 1) == (None, None)
