"""Text-analysis and dedup queries over the ``documents`` table — each
drives a lsd2_spark operator and carries a DuckDB oracle built from the
same portable-hash primitives (functions/portable_hash.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lsd2_spark.functions.numeric import round6, round6_sql
from lsd2_spark.functions.portable_hash import MINHASH_PERMS, MOD, WS, hash64_sql, minhash_term_sql
from lsd2_spark.operators import dedup, multimodal, text_analysis
from lsd2_spark.operators.common import cut_lineage
from lsd2_spark.queries import load_table, register

_K = len(MINHASH_PERMS)

_TOKS_SQL = "list_distinct(regexp_split_to_array(text, '[ \\t\\n\\r\\f]+'))"
_TOKH_SQL = f"{hash64_sql('tok')} % {MOD}"


# ---------------------------------------------------------------------------
# Q30 — exact dedup annotation
# ---------------------------------------------------------------------------


def q30_dedup_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact and normalized-text dedup gated in one row (merged former
    q30/q59 — same grain), tagged by ``variant``."""
    docs = load_table(spark, sf_dir, "documents")
    ex = dedup.exact_dedup(docs, "text", "doc_id").select(
        "doc_id",
        F.col("text_hash").alias("hash"),
        "canonical_id",
        "is_canonical",
        F.lit("exact").alias("variant"),
    )
    no = dedup.normalized_dedup(docs, "text", "doc_id").select(
        "doc_id",
        F.col("norm_hash").alias("hash"),
        "canonical_id",
        "is_canonical",
        F.lit("normalized").alias("variant"),
    )
    return ex.unionByName(no)


register(
    "q30_dedup_variants",
    q30_dedup_variants,
    r"""
    SELECT doc_id, md5(text) AS hash,
           MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
           CAST(doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS INTEGER) AS is_canonical,
           'exact' AS variant
    FROM documents
    UNION ALL
    SELECT doc_id, norm_hash AS hash,
           MIN(doc_id) OVER (PARTITION BY norm_hash) AS canonical_id,
           CAST(doc_id = MIN(doc_id) OVER (PARTITION BY norm_hash) AS INTEGER) AS is_canonical,
           'normalized' AS variant
    FROM (
      SELECT doc_id,
             md5(trim(regexp_replace(regexp_replace(lower(text),
                 '[!-/:-@\[-`{-~]', '', 'g'), '[ \t\n\r\f]+', ' ', 'g'))) AS norm_hash
      FROM documents
    )
    """,
)


# ---------------------------------------------------------------------------
# Q31 — minhash + simhash signatures in one per-doc row (merged former
# q31/q34 — same grain, same distinct-token hashing; the operators
# minhash_signatures / simhash stay separate and unit-tested)
# ---------------------------------------------------------------------------

_SH_BITS = 16


def q31_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    mh = dedup.minhash_signatures(docs, "text", "doc_id")
    sh = dedup.simhash(docs, "text", "doc_id", bits=_SH_BITS)
    return mh.join(sh, "doc_id")


_mh_aggs = ",\n           ".join(
    f"MIN({minhash_term_sql('h', a, b)}) AS mh{i}" for i, (a, b) in enumerate(MINHASH_PERMS)
)
_sh_sums = ",\n           ".join(
    f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}" for b in range(_SH_BITS)
)
_sh_pack = " + ".join(f"CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(_SH_BITS))
register(
    "q31_signatures",
    q31_signatures,
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
    ), hashes AS MATERIALIZED (
      -- full 60-bit hash; the minhash terms re-reduce it mod {MOD}
      -- inside minhash_term_sql (x % m % m == x % m), the simhash bit
      -- sums consume it whole
      SELECT doc_id, {hash64_sql('tok')} AS h FROM toks
    ), sig AS (
      SELECT doc_id, {_mh_aggs}
      FROM hashes GROUP BY doc_id
    ), sums AS (
      SELECT doc_id, {_sh_sums} FROM hashes GROUP BY doc_id
    )
    SELECT s.doc_id, {', '.join(f'mh{i}' for i in range(_K))},
           CAST({_sh_pack} AS BIGINT) AS simhash
    FROM sig s JOIN sums m ON s.doc_id = m.doc_id
    """,
)


# ---------------------------------------------------------------------------
# Q32 — near-dup pair generation, both flavors in one gate row (merged
# former q32/q33 — same (id1, id2, score) grain, tagged by ``variant``):
# LSH candidate pairs with estimated jaccard, and exact n-gram jaccard
# within (lang, source) groups.  Operators stay separate.
# ---------------------------------------------------------------------------


def q32_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH proposes, exact n-gram jaccard verifies — the certified
    composition is the scale-safe one: the exact half scores ONLY the
    LSH candidate pairs (candidate-driven joins; the quadratic
    shared-gram self-join never appears in the plan — pinned by
    tests/test_plans.py)."""
    docs = load_table(spark, sf_dir, "documents")
    # cand feeds both union branches; deliberately NOT materialized —
    # the candidate set is ~9.7M pair rows at sf0.1 and holding it
    # (localCheckpoint) was measured slower than letting the branches
    # recompute it concurrently inside one job.  cut_signatures cuts
    # the NARROW per-doc signature frame instead: the md5-per-token
    # minhash pass ran 8x across the branches and self-join sides
    # (12 parquet scans), now once.
    cand = dedup.lsh_candidate_pairs(docs, "text", "doc_id", cut_signatures=True)
    lsh = cand.select(
        "id1",
        "id2",
        F.col("jaccard_est").alias("score"),
        F.lit("lsh_est").alias("variant"),
    )
    nj = dedup.ngram_jaccard_pairs(
        docs,
        "text",
        "doc_id",
        ["lang", "source"],
        n=3,
        candidates=cand.select("id1", "id2"),
    ).select(
        "id1",
        "id2",
        F.col("jaccard").alias("score"),
        F.lit("ngram_exact").alias("variant"),
    )
    return lsh.unionByName(nj)


_bucket_exprs = ", ".join(
    f"mh{2*b} * {MOD} + mh{2*b+1} AS bucket{b}" for b in range(_K // 2)
)
_band_union = " UNION ALL ".join(
    f"SELECT doc_id, {', '.join(f'mh{i}' for i in range(_K))}, {b} AS band, bucket{b} AS bucket FROM sig"
    for b in range(_K // 2)
)
_agree = " + ".join(f"CASE WHEN l.mh{i} = r.mh{i} THEN 1 ELSE 0 END" for i in range(_K))
# The exact-jaccard half replays the IDENTICAL LSH restriction the
# Spark side applies (candidates=lsh_candidate_pairs(...)): `cand` is
# computed once and feeds both the lsh_est rows and the candidate-driven
# shared-gram join — so the oracle certifies the scale-safe composition,
# not the unrestricted quadratic one.
_Q32_SQL = f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
    ), hashes AS (
      SELECT doc_id, {_TOKH_SQL} AS h FROM toks
    ), sig0 AS (
      SELECT doc_id, {_mh_aggs} FROM hashes GROUP BY doc_id
    ), sig AS MATERIALIZED (
      SELECT *, {_bucket_exprs} FROM sig0
    ), banded AS MATERIALIZED ({_band_union}),
    cand AS MATERIALIZED (
      SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2,
             ({_agree}) AS agree
      FROM banded l JOIN banded r
        ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
    ), grams AS (
      SELECT DISTINCT doc_id, lang, source, substr(text, CAST(i AS INTEGER), 3) AS ng
      FROM documents, UNNEST(range(1, greatest(length(text) - 2, 1) + 1)) AS t(i)
    ), glist AS MATERIALIZED (
      -- per-doc DISTINCT gram set as a list: the shared count becomes a
      -- per-pair list_intersect (the Spark side's array_intersect), not
      -- a row-level self-join on the low-cardinality trigram key, which
      -- DuckDB misplans into an OOM at sf0.1
      SELECT doc_id, lang, source, list(ng) AS ngs, COUNT(*) AS n_grams
      FROM grams GROUP BY doc_id, lang, source
    ), shared AS (
      SELECT c.id1, c.id2,
             len(list_intersect(l1.ngs, l2.ngs)) AS shared,
             l1.n_grams AS n1, l2.n_grams AS n2
      FROM cand c
      JOIN glist l1 ON l1.doc_id = c.id1
      JOIN glist l2 ON l2.doc_id = c.id2
                   AND l2.lang = l1.lang AND l2.source = l1.source
    )
    SELECT id1, id2, CAST(agree AS DOUBLE) / {float(_K)} AS score,
           'lsh_est' AS variant
    FROM cand
    UNION ALL
    SELECT id1, id2,
           FLOOR((CAST(shared AS DOUBLE) / (n1 + n2 - shared)) * 1000000.0 + 0.5) / 1000000.0 AS score,
           'ngram_exact' AS variant
    FROM shared WHERE shared > 0
    """

register("q32_neardup_pairs", q32_neardup_pairs, _Q32_SQL)


# ---------------------------------------------------------------------------
# Q36 — per-doc text profile: token stats + quality score + language ID
# in one gate row (merged former q35/q36/q37 — all per-doc pure-Column
# passes; the standalone operators token_stats / quality_score / lang_id
# remain unit-tested)
# ---------------------------------------------------------------------------

_STOP_SQL = ", ".join(f"'{s}'" for s in text_analysis.STOPWORDS)


def _code_text_col() -> "F.Column":
    """The planted per-doc 'source file' the code battery runs on
    (round 11, VERDICT item 8) — deterministic payloads derived from
    doc_id so every StarCoder/The-Stack rule has victims AND the same
    construction is replayed verbatim in the oracle: XML prolog
    (doc_id%13), autogen header (%11), base64-class blob lines (%7 —
    fails the blob-FRACTION rule while every line stays under the
    length caps), digit-only lines (%17 — fails only the alpha rule),
    the raw single-line salad (%5 — mean line length > 100), else the
    one-token-per-line form that passes the whole battery."""
    nlv = F.regexp_replace(F.col("text"), " ", "\n")
    blob = F.repeat(F.concat(F.repeat(F.lit("Q"), 80), F.lit("\n")), 30)
    did = F.col("doc_id")
    return (
        F.when(did % 13 == 0, F.concat(F.lit('<?xml version="1.0"?>'), F.lit("\n"), nlv))
        .when(did % 11 == 0, F.concat(F.lit("x do not edit x"), F.lit("\n"), nlv))
        .when(did % 7 == 0, F.concat(nlv, F.lit("\n"), blob))
        .when(did % 17 == 0, F.repeat(F.lit("0123\n"), 40))
        .when(did % 5 == 0, F.col("text"))
        .otherwise(nlv)
    )


def q36_doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc text profile (quality + lang + token stats, the merged
    former q35/q36/q37) WIDENED in round 11 with the StarCoder/The-
    Stack code rule battery over a planted per-doc source file — the
    battery's 7 metrics + 6 flags are hash-pinned here (same per-doc
    grain; operator stays standalone in operators/code_rules.py)."""
    from lsd2_spark.operators.code_rules import starcoder_code_flags

    docs = load_table(spark, sf_dir, "documents")
    prof = text_analysis.doc_profile(docs, "text", "doc_id")
    ts = text_analysis.token_stats(docs, "text", "doc_id")
    code = starcoder_code_flags(
        docs.select("doc_id", _code_text_col().alias("text")), "text", "doc_id"
    )
    return prof.join(ts, "doc_id").join(code, "doc_id")


_Q35_COLS = f"""
           length(d.text) AS n_chars_obs,
           len(regexp_split_to_array(d.text, '[ \\t\\n\\r\\f]+')) AS n_tokens,
           len(list_distinct(regexp_split_to_array(d.text, '[ \\t\\n\\r\\f]+'))) AS n_uniq_tokens,
           FLOOR((CAST(length(regexp_replace(d.text, '[ \\t\\n\\r\\f]+', '', 'g')) AS DOUBLE)
                 / len(regexp_split_to_array(d.text, '[ \\t\\n\\r\\f]+'))) * 1000000.0 + 0.5) / 1000000.0 AS avg_token_len,
           CAST(len(regexp_extract_all(d.text, '{text_analysis.BPE_TOKEN_RE.replace("'", "''")}')) AS INTEGER)
             AS n_bpe_tokens
"""


_hit_cols = ",\n           ".join(
    f"len(list_filter(ltoks, x -> x IN ({', '.join(repr(m) for m in ms)}))) AS hits_{l}"
    for l, ms in text_analysis.LANG_MARKERS.items()
)
_langs = list(text_analysis.LANG_MARKERS)
_best = f"greatest({', '.join('hits_' + l for l in _langs)})"
_label = "'und'"
for _l in reversed(_langs):
    _label = f"CASE WHEN hits_{_l} = {_best} AND {_best} > 0 THEN '{_l}' ELSE {_label} END"
def _q36_sql() -> str:
    from lsd2_spark.operators.code_rules import _BLOB, AUTOGEN_MARKERS

    nlv = "regexp_replace(text, ' ', chr(10), 'g')"
    ct_case = f"""CASE
               WHEN doc_id % 13 = 0 THEN '<?xml version="1.0"?>' || chr(10) || {nlv}
               WHEN doc_id % 11 = 0 THEN 'x do not edit x' || chr(10) || {nlv}
               WHEN doc_id % 7 = 0 THEN {nlv} || chr(10) || repeat(repeat('Q', 80) || chr(10), 30)
               WHEN doc_id % 17 = 0 THEN repeat('0123' || chr(10), 40)
               WHEN doc_id % 5 = 0 THEN text
               ELSE {nlv} END"""
    autogen = " OR ".join(f"contains(header, '{m}')" for m in AUTOGEN_MARKERS)
    trimset = "' ' || chr(9) || chr(13) || chr(10) || chr(12) || chr(65279)"
    ht = "n_chars > 0"
    # COALESCE(..., FALSE): the operator's flags are total (False on
    # null/empty text) while a bare SQL AND over a NULL n_chars yields
    # NULL; the integer metrics below are CASE-gated for the same
    # reason (the operator NULLs them where has_text is false — an
    # ungated CAST forks int64-vs-float64 between the engines' pandas
    # output on corpora with empty documents)
    line_ok = f"COALESCE({ht} AND mean_ll <= 100.0 AND max_ll <= 1000, FALSE)"
    alpha_ok = f"COALESCE({ht} AND CAST(alpha_chars AS DOUBLE) / n_chars >= 0.25, FALSE)"
    not_autogen = f"COALESCE({ht} AND NOT ({autogen}), FALSE)"
    blob_ok = (
        f"COALESCE({ht} AND CAST(n_chars - blob_removed AS DOUBLE) / n_chars <= 0.5"
        f" AND longest_blob <= 1024, FALSE)"
    )
    not_xml = f"COALESCE({ht} AND NOT is_xml, FALSE)"
    return f"""
    WITH t AS (
      SELECT doc_id,
             regexp_split_to_array(text, '[ \\t\\n\\r\\f]+') AS toks,
             regexp_split_to_array(lower(text), '[ \\t\\n\\r\\f]+') AS ltoks
      FROM documents
    ), m AS (
      SELECT doc_id,
             CAST(len(list_filter(toks, x -> x IN ({_STOP_SQL}))) AS DOUBLE) / len(toks) AS stop_share,
             CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS diversity,
             CASE WHEN len(toks) BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END AS length_ok,
             {_hit_cols}
      FROM t
    ), cdoc AS (
      SELECT doc_id, {ct_case} AS ct FROM documents
    ), craw AS (
      SELECT doc_id, ct, length(ct) AS n_chars,
             string_split(ct, chr(10)) AS lines
      FROM cdoc
    ), cm AS MATERIALIZED (
      SELECT doc_id, n_chars,
             len(lines) AS n_lines,
             CAST(list_sum(list_transform(lines, l -> length(l))) AS DOUBLE) / len(lines) AS mean_ll,
             list_max(list_transform(lines, l -> length(l))) AS max_ll,
             length(regexp_replace(ct, '[^A-Za-z]', '', 'g')) AS alpha_chars,
             length(regexp_replace(ct, '{_BLOB}', '', 'g')) AS blob_removed,
             COALESCE(list_max(list_transform(regexp_extract_all(ct, '{_BLOB}'), b -> length(b))), 0) AS longest_blob,
             lower(array_to_string(list_slice(lines, 1, 5), chr(10))) AS header,
             substr(trim(ct, {trimset}), 1, 5) = '<?xml' AS is_xml,
             length(regexp_replace(ct, '<[^>]*>', '', 'g')) AS visible_chars
      FROM craw
    ), code AS MATERIALIZED (
      SELECT doc_id,
             CASE WHEN {ht} THEN CAST(n_lines AS BIGINT) END AS n_lines,
             CASE WHEN {ht} THEN {round6_sql('mean_ll')} END AS mean_line_len,
             CASE WHEN {ht} THEN CAST(max_ll AS BIGINT) END AS max_line_len,
             CASE WHEN {ht} THEN {round6_sql('CAST(alpha_chars AS DOUBLE) / n_chars')} END AS alpha_frac,
             CASE WHEN {ht} THEN {round6_sql('CAST(n_chars - blob_removed AS DOUBLE) / n_chars')} END AS blob_frac,
             CASE WHEN {ht} THEN CAST(longest_blob AS BIGINT) END AS longest_blob_run,
             CASE WHEN {ht} THEN {round6_sql('CAST(visible_chars AS DOUBLE) / n_chars')} END AS visible_text_frac,
             {line_ok} AS line_len_ok,
             {alpha_ok} AS alpha_ok,
             {not_autogen} AS not_autogen,
             {blob_ok} AS blob_ok,
             {not_xml} AS not_xml,
             ({line_ok} AND {alpha_ok} AND {not_autogen} AND {blob_ok} AND {not_xml}) AS code_pass
      FROM cm
    )
    SELECT m.doc_id,
           FLOOR((stop_share) * 1000000.0 + 0.5) / 1000000.0 AS stopword_share,
           FLOOR((diversity) * 1000000.0 + 0.5) / 1000000.0 AS lexical_diversity,
           FLOOR((40.0 * diversity + 30.0 * stop_share + 30.0 * length_ok) * 1000000.0 + 0.5) / 1000000.0 AS quality,
           CASE WHEN FLOOR((40.0 * diversity + 30.0 * stop_share + 30.0 * length_ok) * 1000000.0 + 0.5) / 1000000.0 >= 60 THEN 'good'
                WHEN FLOOR((40.0 * diversity + 30.0 * stop_share + 30.0 * length_ok) * 1000000.0 + 0.5) / 1000000.0 >= 30 THEN 'ok'
                ELSE 'spam' END AS bucket,
           {', '.join('hits_' + l for l in _langs)},
           {_label} AS lang_pred,
           {_Q35_COLS},
           c.n_lines, c.mean_line_len, c.max_line_len, c.alpha_frac,
           c.blob_frac, c.longest_blob_run, c.visible_text_frac,
           c.line_len_ok, c.alpha_ok, c.not_autogen, c.blob_ok, c.not_xml,
           c.code_pass
    FROM m JOIN documents d ON d.doc_id = m.doc_id
           JOIN code c ON c.doc_id = m.doc_id
    """


register("q36_doc_profile", q36_doc_profile, _q36_sql())


# ---------------------------------------------------------------------------
# Q38 — document fingerprints: content md5 + winnowing sketch in ONE scan
# (merged former q38/q39 so both operators share a single gate row; the
# underlying operators content_fingerprint / winnow_fingerprint remain
# separate and unit-tested)
# ---------------------------------------------------------------------------


def q38_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_analysis.fingerprints(
        load_table(spark, sf_dir, "documents"), "text", "doc_id"
    )


# The winnow sketch IS SQL-expressible: the emitted value is the minimum
# k-gram rolling hash (min of window-minima == global min), so the oracle
# recomputes the k=8 polynomial hash per character position with 8 LEADs
# and takes the per-document MIN.  Both sides hash CODEPOINTS (ord/substr
# here, utf-32 decode in text_analysis._winnow_kernel), so parity holds
# for non-ASCII text too.  powvec[j] = 257^(7-j) mod (2^31-1).
_WINNOW_POWS = [623063367, 336663071, 168429323, 67503107, 16974593, 66049, 257, 1]
_WINNOW_TERMS = " + ".join(
    f"(lead(c, {j}) OVER w * {p} % 2147483647)" for j, p in enumerate(_WINNOW_POWS)
)

register(
    "q38_fingerprints",
    q38_fingerprints,
    f"""
    WITH pos AS (
      SELECT doc_id, i, CAST(ord(substr(text, CAST(i AS INT), 1)) AS BIGINT) AS c
      FROM documents, unnest(range(1, length(text) + 1)) AS t(i)
    ),
    h AS (
      SELECT doc_id,
             ({_WINNOW_TERMS}) % 2147483647 AS kh,
             lead(c, 7) OVER w AS c_last
      FROM pos
      WINDOW w AS (PARTITION BY doc_id ORDER BY i)
    ),
    m AS (
      SELECT doc_id, MIN(kh) AS winnow_min FROM h WHERE c_last IS NOT NULL GROUP BY doc_id
    )
    SELECT d.doc_id,
           md5(regexp_replace(lower(d.text), '[ \\t\\n\\r\\f]+', '', 'g')) AS fingerprint,
           CAST(COALESCE(m.winnow_min, 0) AS BIGINT) AS winnow_min
    FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id
    """,
)


# ---------------------------------------------------------------------------
# Q42 — multimodal blob table (binary payload plumbing, oracle-checked
# metadata); Q43 — feature extraction via mapInPandas (rows-only)
# ---------------------------------------------------------------------------


def _blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.to_blob_table(docs, "text", "doc_id", "text/fake")


def q42_media_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blob metadata + extracted features in one row per payload
    (merged former q42/q43 — same media_id grain, one blob scan each,
    joined on the key)."""
    blobs = _blobs(spark, sf_dir)
    meta = blobs.select("media_id", "media_type", "n_bytes", "payload_md5")
    feats = multimodal.extract_features(blobs).select(
        "media_id", "feat_mean", "feat_entropy", "sketch"
    )
    return meta.join(feats, "media_id")


# Text payloads are not images, so the feature kernel's decode dispatch
# falls through to byte statistics (deterministic byte arithmetic over
# the UTF-8 text; pure ASCII here — verified), which DuckDB replays:
# mean byte, Shannon entropy over byte frequencies, md5 prefix.  The
# REAL-decode path is gate-checked by q53 (PPM pixels) and pytest (PNG).
register(
    "q42_media_profile",
    q42_media_profile,
    """
    WITH chars AS (
      SELECT doc_id, CAST(ord(substr(text, CAST(i AS INT), 1)) AS BIGINT) AS c
      FROM documents, unnest(range(1, length(text) + 1)) t(i)
    ), freq AS (
      SELECT doc_id, c, COUNT(*) AS n FROM chars GROUP BY doc_id, c
    ), stats AS (
      SELECT f.doc_id,
             CAST(SUM(f.n * f.c) AS DOUBLE) / SUM(f.n) AS feat_mean,
             FLOOR((-SUM((f.n / CAST(d.L AS DOUBLE)) * log2(f.n / CAST(d.L AS DOUBLE)))) * 1000000.0 + 0.5) / 1000000.0
               AS feat_entropy
      FROM freq f JOIN (SELECT doc_id, length(text) AS L FROM documents) d
        ON d.doc_id = f.doc_id
      GROUP BY f.doc_id
    )
    SELECT d.doc_id AS media_id, 'text/fake' AS media_type,
           octet_length(encode(d.text)) AS n_bytes,
           md5(d.text) AS payload_md5,
           COALESCE(s.feat_mean, 0.0) AS feat_mean,
           COALESCE(s.feat_entropy, 0.0) AS feat_entropy,
           substr(md5(d.text), 1, 16) AS sketch
    FROM documents d LEFT JOIN stats s ON s.doc_id = d.doc_id
    """,
)


# ---------------------------------------------------------------------------
# Q53 — REAL image decode in the gate: wrap each document's leading 480
# bytes as a binary P6 PPM payload (16x10 RGB), run the pure-NumPy
# decoder inside extract_features, and compute features on the decoded
# PIXELS.  PPM is uncompressed, so DuckDB can replay the exact pixel
# bytes (header-skip + byte statistics) — a full hash-match oracle for
# the decode path.  (PNG decode is exercised in pytest with zlib
# ground truth; inflate is not SQL-expressible.)
# ---------------------------------------------------------------------------

_PPM_HEADER = "P6\n16 10\n255\n"  # 13 bytes; 16*10*3 = 480 pixel bytes


def q53_ppm_pixel_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged former q53/q55 (same PPM-decode grain, one blob table,
    joined on media_id): pixel features from the decoded image PLUS the
    8x5 nearest-neighbor thumbnail re-encoded as P6 — decode, feature
    extraction, resample and re-encode all hash-gated in one row.  The
    unmerge plan lives in COVERAGE.md."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.concat(
        F.lit(_PPM_HEADER.encode("ascii")),
        F.encode(F.rpad(F.substring(F.col("text"), 1, 480), 480, "x"), "UTF-8"),
    )
    blobs = multimodal.to_blob_table(
        docs.withColumn("_ppm", payload), "_ppm", "doc_id",
        "image/x-portable-pixmap",
    )
    feats = multimodal.extract_features(blobs)
    small = multimodal.resize_images(blobs, width=8, height=5, out_format="ppm")
    thumbs = small.select(
        "media_id", "width", "height",
        F.md5(F.col("payload")).alias("thumb_md5"),
        F.length(F.col("payload")).alias("thumb_bytes"),
    )
    return feats.join(thumbs, "media_id")


register(
    "q53_ppm_pixel_features",
    q53_ppm_pixel_features,
    """
    WITH padded AS (
      SELECT doc_id, rpad(substr(text, 1, 480), 480, 'x') AS s FROM documents
    ), chars AS (
      SELECT doc_id, CAST(ord(substr(s, CAST(i AS INT), 1)) AS BIGINT) AS c
      FROM padded, unnest(range(1, 481)) t(i)
    ), freq AS (
      SELECT doc_id, c, COUNT(*) AS n FROM chars GROUP BY doc_id, c
    ), stats AS (
      SELECT doc_id,
             CAST(SUM(n * c) AS DOUBLE) / 480 AS feat_mean,
             FLOOR((-SUM((n / 480.0) * log2(n / 480.0))) * 1000000.0 + 0.5) / 1000000.0 AS feat_entropy
      FROM freq GROUP BY doc_id
    ), grid AS (
      -- nearest-neighbor source byte for thumbnail pixel (r, c, ch):
      -- src_row = r*10//5 = 2r, src_col = c*16//8 = 2c
      SELECT p.doc_id, r.r, c.c, ch.ch,
             substr(p.s, CAST(((2 * r.r) * 16 + (2 * c.c)) * 3 + ch.ch + 1 AS INT), 1) AS px
      FROM padded p,
           unnest(range(0, 5)) r(r),
           unnest(range(0, 8)) c(c),
           unnest(range(0, 3)) ch(ch)
    ), thumb AS (
      SELECT doc_id,
             string_agg(px, '' ORDER BY r, c, ch) AS pix
      FROM grid GROUP BY doc_id
    )
    SELECT p.doc_id AS media_id, CAST(493 AS INTEGER) AS n_bytes,
           s.feat_mean, s.feat_entropy,
           substr(md5('P6' || chr(10) || '16 10' || chr(10) || '255' || chr(10) || p.s), 1, 16)
             AS sketch,
           CAST(8 AS INTEGER) AS width, CAST(5 AS INTEGER) AS height,
           md5('P6' || chr(10) || '8 5' || chr(10) || '255' || chr(10) || t.pix)
             AS thumb_md5,
           CAST(11 + 120 AS INTEGER) AS thumb_bytes
    FROM padded p
    JOIN stats s ON s.doc_id = p.doc_id
    JOIN thumb t ON t.doc_id = p.doc_id
    """,
)


# ---------------------------------------------------------------------------
# Q56 — REAL frame sampling in the gate: each document becomes a 3-frame
# concatenated-PPM stream (the public ffmpeg image2pipe ppm-pipe format:
# complete P6 files back-to-back, 4x4 RGB each), sample_frames(every_n=2)
# keeps frames 0 and 2, and the oracle replays the per-frame byte slices.
# ---------------------------------------------------------------------------

_FRAME_HEADER = "P6\n4 4\n255\n"  # 11 bytes; 4*4*3 = 48 pixel bytes/frame


def q56_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pix = F.rpad(F.substring(F.col("text"), 1, 144), 144, "x")
    stream = F.concat(
        *[
            F.concat(
                F.lit(_FRAME_HEADER.encode("ascii")),
                F.encode(F.substring(pix, 1 + 48 * f, 48), "UTF-8"),
            )
            for f in range(3)
        ]
    )
    blobs = multimodal.to_blob_table(
        docs.withColumn("_vid", stream), "_vid", "doc_id", "video/x-ppm-stream"
    )
    frames = multimodal.sample_frames(blobs, every_n=2)
    return frames.select("media_id", "frame_idx", "width", "height", "frame_mean")


register(
    "q56_frame_sample",
    q56_frame_sample,
    """
    WITH padded AS (
      SELECT doc_id, rpad(substr(text, 1, 144), 144, 'x') AS s FROM documents
    ), frames AS (
      SELECT doc_id, CAST(f.f AS INTEGER) AS frame_idx,
             substr(s, CAST(48 * f.f + 1 AS INT), 48) AS fb
      FROM padded, unnest([0, 2]) f(f)
    ), chars AS (
      SELECT doc_id, frame_idx,
             CAST(ord(substr(fb, CAST(i AS INT), 1)) AS BIGINT) AS b
      FROM frames, unnest(range(1, 49)) t(i)
    )
    SELECT doc_id AS media_id, frame_idx,
           CAST(4 AS INTEGER) AS width, CAST(4 AS INTEGER) AS height,
           CAST(SUM(b) AS DOUBLE) / 48.0 AS frame_mean
    FROM chars GROUP BY doc_id, frame_idx
    """,
)


# ---------------------------------------------------------------------------
# Q54 — REAL audio decode in the gate: wrap each document's leading 480
# bytes as an 8-bit PCM mono WAV (16 kHz), decode with the pure-NumPy
# RIFF codec, and compute signal statistics on the decoded SAMPLES.
# 8-bit PCM is uncompressed (sample = (byte - 128)/128), so DuckDB
# replays the decode exactly.  (The FFT spectral centroid is covered in
# pytest against NumPy; FFT is not SQL-expressible.)
# ---------------------------------------------------------------------------


def _wav_header_480() -> bytes:
    """44-byte canonical RIFF header for 480 frames of 8-bit mono PCM
    at 16 kHz (everything after the header is the raw sample bytes)."""
    import numpy as np

    from lsd2_spark.sources.audiocodec import encode_wav

    return encode_wav(np.zeros(480), sample_rate=16_000, bits=8)[:44]


def q54_wav_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payload = F.concat(
        F.lit(_wav_header_480()),
        F.encode(F.rpad(F.substring(F.col("text"), 1, 480), 480, "x"), "UTF-8"),
    )
    blobs = multimodal.to_blob_table(
        docs.withColumn("_wav", payload), "_wav", "doc_id", "audio/wav"
    )
    return multimodal.extract_audio_features(blobs).select(
        "media_id", "n_frames", "sample_rate", "amp_mean", "amp_rms", "zcr"
    )


register(
    "q54_wav_audio_features",
    q54_wav_audio_features,
    """
    WITH padded AS (
      SELECT doc_id, rpad(substr(text, 1, 480), 480, 'x') AS s FROM documents
    ), bytes AS (
      SELECT doc_id, i,
             CAST(ord(substr(s, CAST(i AS INT), 1)) AS BIGINT) - 128 AS k
      FROM padded, unnest(range(1, 481)) t(i)
    ), lagged AS (
      SELECT doc_id, k,
             LAG(k) OVER (PARTITION BY doc_id ORDER BY i) AS pk
      FROM bytes
    ), zc AS (
      SELECT doc_id,
             COUNT(*) FILTER (WHERE pk IS NOT NULL AND (k >= 0) <> (pk >= 0)) AS nz
      FROM lagged GROUP BY doc_id
    ), st AS (
      -- integer sums (exact in any engine), then the SAME float
      -- division sequence the decoder uses: /128 (exact, power of
      -- two) then /480 — bit-identical to numpy, no rounding needed
      SELECT doc_id,
             (CAST(SUM(k) AS DOUBLE) / 128.0) / 480.0 AS amp_mean,
             sqrt((CAST(SUM(k * k) AS DOUBLE) / 16384.0) / 480.0) AS amp_rms
      FROM bytes GROUP BY doc_id
    )
    SELECT p.doc_id AS media_id, CAST(480 AS BIGINT) AS n_frames,
           CAST(16000 AS INTEGER) AS sample_rate,
           st.amp_mean, st.amp_rms, CAST(zc.nz AS DOUBLE) / 479.0 AS zcr
    FROM padded p
    JOIN st ON st.doc_id = p.doc_id
    JOIN zc ON zc.doc_id = p.doc_id
    """,
)


# ---------------------------------------------------------------------------
# Q46 — fuzzy dedup clusters: LSH pairs → threshold → connected
# components (min-label propagation) → canonical survivors
# ---------------------------------------------------------------------------

_CC_THRESHOLD = 0.9
_CC_STEPS = 4


def q46_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_clusters(
        load_table(spark, sf_dir, "documents"), "text", "doc_id",
        min_jaccard=_CC_THRESHOLD, n_steps=_CC_STEPS,
    )


def _cc_oracle_sql(threshold: float, n_steps: int) -> str:
    """Replays dedup_clusters: the q32 pair SQL feeds a thresholded
    symmetric edge list, then ``n_steps`` unrolled rounds of min-label
    propagation (n_steps ≥ diameter — measured fixpoint ≤ 2 on the
    corpus fixtures, convergence asserted in pytest)."""
    steps = []
    prev = "l0"
    for i in range(1, n_steps + 1):
        steps.append(f"""
    l{i} AS MATERIALIZED (
      SELECT l.v, LEAST(l.lbl, COALESCE(m.nl, l.lbl)) AS lbl
      FROM {prev} l LEFT JOIN (
        SELECT e.a, MIN(p.lbl) AS nl FROM e JOIN {prev} p ON p.v = e.b GROUP BY e.a
      ) m ON m.a = l.v
    )""")
        prev = f"l{i}"
    return f"""
    WITH lsh AS MATERIALIZED (
      -- _Q32_SQL is the merged q32 row (lsh_est UNION ngram_exact);
      -- clustering is fed by the LSH estimate only, as the operator is
      SELECT id1, id2, score AS jaccard_est
      FROM ({_Q32_SQL}) q WHERE variant = 'lsh_est'
    ),
    e AS MATERIALIZED (
      SELECT id1 AS a, id2 AS b FROM lsh WHERE jaccard_est >= {threshold}
      UNION ALL
      SELECT id2 AS a, id1 AS b FROM lsh WHERE jaccard_est >= {threshold}
    ),
    l0 AS MATERIALIZED (SELECT doc_id AS v, CAST(doc_id AS BIGINT) AS lbl FROM documents),{','.join(steps)}
    SELECT v AS doc_id, lbl AS cluster_id,
           CAST(v = lbl AS INTEGER) AS is_canonical
    FROM {prev}
    """


register(
    "q46_dedup_clusters",
    q46_dedup_clusters,
    oracle=_cc_oracle_sql(_CC_THRESHOLD, _CC_STEPS),
)


# ---------------------------------------------------------------------------
# Q49/Q50 — deterministic sampling & splits (training-pipeline
# reproducibility primitives; decisions replayed exactly by the oracle),
# WIDENED in round 10 with the temperature-mixture columns (same
# all-documents grain): the documents' sources are uniform by
# construction, so the mixture strata are a deterministic doc_id-derived
# 60/30/10 skew ('web'/'books'/'code') that tempering actually has to
# work on.  The oracle recomputes the whole mixture — per-stratum
# counts, n^alpha weights, the normalizer, the target-scaled fractions
# snapped to 6 decimals (frac_round=6, the floor(f*1e6+0.5)/1e6 idiom
# on both sides so pow last-ulp / sum-order drift can't fork a keep
# decision) — and replays u < frac per row.
# ---------------------------------------------------------------------------

_SAMPLE_FRACTIONS = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1}
_SPLIT_WEIGHTS = {"test": 0.05, "train": 0.9, "val": 0.05}
_MIX_ALPHA, _MIX_TARGET, _MIX_SALT = 0.7, 250, "mix"


def _mix_strata() -> "F.Column":
    # built lazily: Column construction needs an active SparkContext
    return F.when(F.col("doc_id") % 10 < 6, "web").when(
        F.col("doc_id") % 10 < 9, "books"
    ).otherwise("code")


_MIX_STRATA_SQL = (
    "CASE WHEN doc_id % 10 < 6 THEN 'web' "
    "WHEN doc_id % 10 < 9 THEN 'books' ELSE 'code' END"
)


def q49_sample_and_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified-sample membership + train/val/test assignment + the
    temperature-mixture keep decision in one per-doc projection (merged
    former q49/q50 + widened with temperature_mixture — all three are
    zero-shuffle Column decisions over deterministic uniforms; the
    mixture adds one plan-sized count collect)."""
    from lsd2_spark.operators.sampling import (
        assign_splits,
        stratified_keep,
        temperature_mixture,
    )

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "mix_stratum", _mix_strata()
    )
    # run the real operator; reuse its published fractions to express
    # the identical keep decision as a flag at the all-docs grain (the
    # operator's own filter IS stratified_keep over these fractions)
    _, fracs = temperature_mixture(
        docs, "doc_id", "mix_stratum",
        alpha=_MIX_ALPHA, target_rows=_MIX_TARGET, salt=_MIX_SALT,
        frac_round=6,
    )
    mix_frac = F.lit(0.0)
    for s, f in sorted(fracs.items()):
        mix_frac = F.when(F.col("mix_stratum") == s, F.lit(f)).otherwise(mix_frac)
    return assign_splits(docs, "doc_id", _SPLIT_WEIGHTS).select(
        "doc_id",
        "source",
        "split",
        stratified_keep("doc_id", _SAMPLE_FRACTIONS, strata_col="source").alias(
            "in_sample"
        ),
        "mix_stratum",
        mix_frac.alias("mix_frac"),
        stratified_keep(
            "doc_id", fracs, strata_col="mix_stratum", salt=_MIX_SALT
        ).alias("mix_keep"),
    )


def _sampling_oracle() -> str:
    from lsd2_spark.operators.sampling import deterministic_uniform_sql

    u = deterministic_uniform_sql("doc_id")
    u_mix = deterministic_uniform_sql("doc_id", _MIX_SALT)
    frac = "CASE " + " ".join(
        f"WHEN source = '{v}' THEN {f}" for v, f in sorted(_SAMPLE_FRACTIONS.items())
    ) + " ELSE 0.0 END"

    cases, cum = [], 0.0
    names = sorted(_SPLIT_WEIGHTS)
    for name in names:
        cum += _SPLIT_WEIGHTS[name]
        cases.append(f"WHEN {u} < {cum!r} THEN '{name}'")
    return f"""
    WITH s AS (
      SELECT doc_id, source, {_MIX_STRATA_SQL} AS mix_stratum FROM documents
    ), cnt AS (
      SELECT mix_stratum, COUNT(*) AS n, POW(COUNT(*), {_MIX_ALPHA}) AS w
      FROM s GROUP BY mix_stratum
    ), fr AS MATERIALIZED (
      SELECT mix_stratum,
             FLOOR(LEAST(1.0, {_MIX_TARGET} * w / (SELECT SUM(w) FROM cnt) / n)
                   * 1000000.0 + 0.5) / 1000000.0 AS mix_frac
      FROM cnt
    )
    SELECT s.doc_id, s.source,
           CASE {' '.join(cases)} ELSE '{names[-1]}' END AS split,
           {u} < {frac} AS in_sample,
           s.mix_stratum, fr.mix_frac,
           {u_mix} < fr.mix_frac AS mix_keep
    FROM s JOIN fr ON s.mix_stratum = fr.mix_stratum
    """


register("q49_sample_and_split", q49_sample_and_split, _sampling_oracle())


# ---------------------------------------------------------------------------
# Q57 — KMV sketch family, one row per event_type (merged former
# q57/q13 — same grain — plus the sketch SET ALGEBRA, round 10):
#
# - distinct-count estimate from the deterministic bottom-k sketch
#   (occupancy, estimate) — the portable md5 hash makes it
#   bit-reproducible in DuckDB, unlike HLL approx_count_distinct;
# - the EXACT distinct stats beside it (former q13: COUNT(DISTINCT),
#   min/max/count) — the estimate is gated next to its ground truth;
# - cross-corpus set cardinalities (kmv_set_stats over the even/odd
#   user_id halves): est_left/right/union/intersection + jaccard, the
#   full mergeable-sketch algebra replayed list-for-list in SQL.
# ---------------------------------------------------------------------------

_KMV_K = 64


def q57_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lsd2_spark.operators.sketches import kmv_distinct, kmv_set_stats, kmv_sketch
    from lsd2_spark.queries.relational import q13_distinct_stats

    ev = load_table(spark, sf_dir, "events")
    dist = kmv_distinct(ev, "user_id", ["event_type"], k=_KMV_K)
    exact = q13_distinct_stats(spark, sf_dir)
    ska = kmv_sketch(
        ev.filter(F.col("user_id") % 2 == 0), "user_id", ["event_type"], k=_KMV_K
    )
    skb = kmv_sketch(
        ev.filter(F.col("user_id") % 2 == 1), "user_id", ["event_type"], k=_KMV_K
    )
    stats = kmv_set_stats(ska, skb, ["event_type"], k=_KMV_K)
    return dist.join(exact, "event_type").join(stats, "event_type")


_q57_est = (
    f"CASE WHEN len({{s}}) < {_KMV_K} THEN CAST(len({{s}}) AS DOUBLE) "
    f"ELSE {float(_KMV_K - 1)} * 1152921504606846976.0 / CAST({{s}}[{_KMV_K}] AS DOUBLE) END"
)

register(
    "q57_kmv_distinct",
    q57_kmv_distinct,
    f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             {hash64_sql("CAST(user_id AS VARCHAR)")} AS hh,
             user_id % 2 AS half
      FROM events WHERE user_id IS NOT NULL
    ), rk AS (
      SELECT event_type, hh,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hh) AS r
      FROM h
    ), agg AS (
      SELECT event_type, COUNT(*) AS n, MAX(hh) AS hk
      FROM rk WHERE r <= {_KMV_K} GROUP BY event_type
    ), ex AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
             MIN(value) AS min_value, MAX(value) AS max_value, COUNT(*) AS n
      FROM events GROUP BY event_type
    ), ra AS (
      SELECT event_type, hh,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hh) AS r
      FROM h WHERE half = 0
    ), sa AS (
      SELECT event_type, list(hh ORDER BY hh) AS sk
      FROM ra WHERE r <= {_KMV_K} GROUP BY event_type
    ), rb AS (
      SELECT event_type, hh,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hh) AS r
      FROM h WHERE half = 1
    ), sb AS (
      SELECT event_type, list(hh ORDER BY hh) AS sk
      FROM rb WHERE r <= {_KMV_K} GROUP BY event_type
    ), j AS (
      SELECT COALESCE(sa.event_type, sb.event_type) AS event_type,
             COALESCE(sa.sk, CAST([] AS BIGINT[])) AS a,
             COALESCE(sb.sk, CAST([] AS BIGINT[])) AS b
      FROM sa FULL JOIN sb ON sa.event_type = sb.event_type
    ), u AS (
      SELECT event_type, a, b,
             (len(a) < {_KMV_K} AND len(b) < {_KMV_K}) AS both_exact,
             CASE WHEN len(a) < {_KMV_K} AND len(b) < {_KMV_K}
                  THEN list_sort(list_distinct(list_concat(a, b)))
                  ELSE list_sort(list_distinct(list_concat(a, b)))[1:{_KMV_K}]
             END AS uu
      FROM j
    ), ss AS (
      SELECT event_type,
             {_q57_est.format(s='a')} AS est_left,
             {_q57_est.format(s='b')} AS est_right,
             CASE WHEN both_exact THEN CAST(len(uu) AS DOUBLE)
                  ELSE {_q57_est.format(s='uu')} END AS est_union,
             CASE WHEN len(uu) > 0
                  THEN CAST(len(list_intersect(uu, list_intersect(a, b))) AS DOUBLE)
                       / len(uu)
                  ELSE 0.0 END AS jaccard_est
      FROM u
    )
    SELECT agg.event_type, CAST(agg.n AS BIGINT) AS n_kept,
           CASE WHEN agg.n < {_KMV_K} THEN CAST(agg.n AS DOUBLE)
                ELSE {float(_KMV_K - 1)} * 1152921504606846976.0 / CAST(agg.hk AS DOUBLE)
           END AS est_distinct,
           ex.n_users, ex.min_value, ex.max_value, ex.n,
           ss.est_left, ss.est_right, ss.est_union,
           ss.jaccard_est * ss.est_union AS est_intersection,
           ss.jaccard_est
    FROM agg
    JOIN ex ON ex.event_type = agg.event_type
    JOIN ss ON ss.event_type = agg.event_type
    """,
)


# ---------------------------------------------------------------------------
# Q58 — deterministic weighted sampling (A-Res): priority u^(1/w) with
# the portable hash uniform, top-n per source stratum.  Weight here is
# the document length — the "sample long documents preferentially"
# shape of corpus mixing.  Priorities differ across engines only in
# the last ulp (pow is not correctly rounded), but per-stratum
# priority spacing (~1/n) is ~13 orders of magnitude wider, so the
# ranking — and therefore the sample — is engine-stable.
# ---------------------------------------------------------------------------

_WS_N = 20
_CAP_N = 30


def q58_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-Res weighted reservoir + uniform per-source quota cap in ONE
    gate row (merged former q58/q60 — same ``(doc_id, source, rank)``
    per-source-sampling grain, tagged by ``variant``; the slot freed
    gates the curation funnel, q74).  Operators stay separate."""
    from lsd2_spark.operators.sampling import cap_per_stratum, weighted_sample

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "wt", F.length(F.col("text")).cast("double")
    )
    ares = weighted_sample(docs, "doc_id", "wt", _WS_N, strata_col="source").select(
        "doc_id",
        "source",
        round6(F.col("priority")).alias("priority"),
        F.col("rnk").cast("int").alias("rnk"),
        F.lit("ares").alias("variant"),
    )
    cap = cap_per_stratum(docs, "doc_id", "source", _CAP_N).select(
        "doc_id",
        "source",
        F.lit(None).cast("double").alias("priority"),
        F.col("kept_rank").cast("int").alias("rnk"),
        F.lit("cap").alias("variant"),
    )
    return ares.unionByName(cap)


def _weighted_sample_oracle() -> str:
    from lsd2_spark.operators.sampling import deterministic_uniform_sql

    u = deterministic_uniform_sql("doc_id")
    return f"""
    WITH w AS (
      SELECT doc_id, source,
             POWER({u}, 1.0 / length(text)) AS priority
      FROM documents WHERE length(text) > 0
    ), r AS (
      SELECT doc_id, source, priority,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY priority DESC, doc_id ASC) AS rnk
      FROM w
    ), c AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY {u} ASC, doc_id ASC) AS kept_rank
      FROM documents
    )
    SELECT doc_id, source, FLOOR((priority) * 1000000.0 + 0.5) / 1000000.0 AS priority,
           CAST(rnk AS INTEGER) AS rnk, 'ares' AS variant
    FROM r WHERE rnk <= {_WS_N}
    UNION ALL
    SELECT doc_id, source, CAST(NULL AS DOUBLE) AS priority,
           CAST(kept_rank AS INTEGER) AS rnk, 'cap' AS variant
    FROM c WHERE kept_rank <= {_CAP_N}
    """


register("q58_weighted_sample", q58_weighted_sample, _weighted_sample_oracle())


# ---------------------------------------------------------------------------
# (former q60 — per-source corpus quota via the deterministic uniform —
# is merged into q58_weighted_sample above; its slot gates the batch
# curation funnel, q74.)
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Q61 — PII scrub.  The corpus carries no organic PII, so the query
# plants deterministic email/IP/SSN/phone payloads (derived from
# doc_id, reproducible in both engines) before scrubbing — the regex
# chain itself is what's hash-gated, via the md5 of the scrubbed text.
# ---------------------------------------------------------------------------


def q61_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tail = F.concat(
        F.lit(" Contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 ssn 123-45-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" call 415-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    aug = docs.select("doc_id", F.concat(F.col("text"), tail).alias("text"))
    out = text_analysis.redact_pii(aug, "text")
    return out.select(
        "doc_id",
        "n_pii_email",
        "n_pii_ipv4",
        "n_pii_ssn",
        "n_pii_phone",
        "n_pii_redacted",
        F.md5(F.col("text").cast("binary")).alias("scrubbed_md5"),
    )


def _pii_oracle() -> str:
    # counts follow the same progression as the scrub: each class is
    # counted on the text AFTER the previous classes' replacements
    counts_parts = []
    current = "text"
    for n, p, tag in text_analysis.PII_PATTERNS:
        counts_parts.append(
            f"CAST(len(regexp_extract_all({current}, '{p}')) AS INTEGER) AS n_pii_{n}"
        )
        current = f"regexp_replace({current}, '{p}', '{tag}', 'g')"
    counts = ",\n             ".join(counts_parts)
    scrubbed = current
    return f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' Contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                  || '.7 ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || ' call 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               AS text
      FROM documents
    ), c AS (
      SELECT doc_id, text,
             {counts}
      FROM aug
    )
    SELECT doc_id, n_pii_email, n_pii_ipv4, n_pii_ssn, n_pii_phone,
           n_pii_email + n_pii_ipv4 + n_pii_ssn + n_pii_phone AS n_pii_redacted,
           md5({scrubbed}) AS scrubbed_md5
    FROM c
    """


# (registered merged with q62 as q61_text_hygiene below)


# ---------------------------------------------------------------------------
# Q62 — Gopher-style repetition stats.  The corpus is single-line, so
# the query derives a multi-line view (space -> newline, deterministic
# in both engines) to exercise the duplicate-line mass for real; the
# top-bigram pass runs over the unchanged whitespace tokenization.
# ---------------------------------------------------------------------------


def q62_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.translate(F.col("text"), " ", "\n").alias("text")
    )
    return text_analysis.repetition_stats(docs, "text", "doc_id")


_Q62_SQL = """
    WITH d AS (
      SELECT doc_id, replace(text, ' ', chr(10)) AS text FROM documents
    ), l AS (
      SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM d
    ), lc AS (
      SELECT doc_id, line, COUNT(*) AS c FROM l GROUP BY doc_id, line
    ), ls AS (
      SELECT doc_id,
             CAST(SUM(c) AS INTEGER) AS n_lines,
             FLOOR((CAST(SUM(c) - COUNT(*) AS DOUBLE) / SUM(c)) * 1000000.0 + 0.5) / 1000000.0 AS dup_line_frac,
             SUM((c - 1) * length(line)) AS dup_chars,
             SUM(c * length(line)) AS line_chars
      FROM lc GROUP BY doc_id
    ), tok AS (
      SELECT doc_id, regexp_split_to_array(text, '[ \\t\\n\\r\\f]+') AS t, length(text) AS n_chars
      FROM d
    ), bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1]))
               AS bigram
      FROM tok
    ), bc AS (
      SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY doc_id, bigram
    ), tb AS (
      SELECT doc_id, bigram AS top_bigram, CAST(c AS INTEGER) AS top_bigram_n
      FROM (SELECT doc_id, bigram, c,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY c DESC, bigram DESC) AS rn
            FROM bc)
      WHERE rn = 1
    )
    SELECT ls.doc_id, ls.n_lines, ls.dup_line_frac,
           FLOOR((CASE WHEN ls.line_chars > 0
                      THEN CAST(ls.dup_chars AS DOUBLE) / ls.line_chars
                      ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0 AS dup_line_char_frac,
           tb.top_bigram,
           COALESCE(tb.top_bigram_n, 0) AS top_bigram_n,
           FLOOR((COALESCE(CAST(tb.top_bigram_n * length(tb.top_bigram) AS DOUBLE)
                          / nullif(tok.n_chars, 0), 0.0)) * 1000000.0 + 0.5) / 1000000.0 AS top_bigram_char_frac
    FROM ls
    LEFT JOIN tb ON tb.doc_id = ls.doc_id
    JOIN tok ON tok.doc_id = ls.doc_id
    """

# ---------------------------------------------------------------------------
# Q61 (merged former q61/q62 — both per-doc text_analysis projections):
# PII scrub counts + scrubbed-text md5, joined with the Gopher-style
# repetition stats, one gate row per document.
# ---------------------------------------------------------------------------


def q61_text_hygiene(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q61_pii_scrub(spark, sf_dir).join(
        q62_repetition(spark, sf_dir), "doc_id"
    )


_HYGIENE_SQL = f"""
    SELECT p.doc_id,
           p.n_pii_email, p.n_pii_ipv4, p.n_pii_ssn, p.n_pii_phone,
           p.n_pii_redacted, p.scrubbed_md5,
           r.n_lines, r.dup_line_frac, r.dup_line_char_frac,
           r.top_bigram, r.top_bigram_n, r.top_bigram_char_frac
    FROM ({_pii_oracle()}) p
    JOIN ({_Q62_SQL}) r ON p.doc_id = r.doc_id
    """

register("q61_text_hygiene", q61_text_hygiene, _HYGIENE_SQL)


# ---------------------------------------------------------------------------
# Q63 — benchmark decontamination: docs with doc_id % 20 == 0 act as
# the held-out eval set; every other doc is scanned for exact 5-gram
# overlap against the broadcast eval n-gram set.
# ---------------------------------------------------------------------------

_DECONTAM_N = 5


def q63_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lsd2_spark.operators.decontam import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 20 == 0)
    tr = docs.filter(F.col("doc_id") % 20 != 0)
    return decontaminate(tr, ev, "text", "doc_id", n=_DECONTAM_N)


_Q63_SQL = f"""
    WITH tok AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '[ \\t\\n\\r\\f]+') AS t FROM documents
    ), ng AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(t) - {_DECONTAM_N - 2}, 1)),
                                   i -> array_to_string(list_slice(t, i, i + {_DECONTAM_N - 1}), ' ')))
               AS ngram
      FROM tok
    ), ev AS (
      SELECT DISTINCT ngram FROM ng WHERE doc_id % 20 = 0
    ), tr AS (
      SELECT doc_id, ngram FROM ng WHERE doc_id % 20 <> 0
    ), hits AS (
      SELECT doc_id, COUNT(DISTINCT tr.ngram) AS n_eval_ngram_hits,
             MAX(tr.ngram) AS worst_ngram
      FROM tr JOIN ev USING (ngram) GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(h.n_eval_ngram_hits, 0) AS n_eval_ngram_hits,
           h.worst_ngram,
           COALESCE(h.n_eval_ngram_hits, 0) > 0 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 20 <> 0) d
    LEFT JOIN hits h USING (doc_id)
    """

register("q63_decontaminate", q63_decontaminate, _Q63_SQL)


# ---------------------------------------------------------------------------
# Q64 — sequence packing: concatenate-and-chunk manifest, packed per
# source shard in doc_id order at a 512-token sequence length.
# ---------------------------------------------------------------------------

_SEQ_LEN = 512


def q64_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lsd2_spark.operators.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    # Gate hygiene: ``fill_frac`` is projected off — it is the only raw
    # unrounded double on the whole gate surface and is exactly derivable
    # from the integer columns (n_tokens / 512).  The library API keeps it;
    # the driver compares integers only, so no float-to-text formatting
    # difference between engines can red this row.
    return pack_sequences(
        docs, "doc_id", F.size(F.split(F.col("text"), WS)), _SEQ_LEN, "source"
    ).drop("fill_frac")


_Q64_SQL = f"""
    WITH t AS (
      SELECT source, doc_id,
             CAST(len(regexp_split_to_array(text, '[ \\t\\n\\r\\f]+')) AS BIGINT) AS n_tok
      FROM documents
    ), a AS (
      SELECT source, doc_id, n_tok,
             CAST(floor((SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id, n_tok
                                          ROWS UNBOUNDED PRECEDING) - n_tok)
                        / {_SEQ_LEN}.0) AS BIGINT) AS seq_id
      FROM t
    )
    SELECT source, seq_id, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM a GROUP BY source, seq_id
    """

register("q64_pack_sequences", q64_pack_sequences, _Q64_SQL)


# ---------------------------------------------------------------------------
# Q65 — passage windowing (RAG prep): 32-token windows, stride 24
# (overlapping), exact strings and spans in both engines.
# ---------------------------------------------------------------------------

_P_MAX, _P_STRIDE = 32, 24


def q65_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lsd2_spark.operators.packing import split_passages

    return split_passages(
        load_table(spark, sf_dir, "documents"), "text", "doc_id",
        max_tokens=_P_MAX, stride=_P_STRIDE,
    )


register(
    "q65_passages",
    q65_passages,
    f"""
    WITH tok AS (
      SELECT doc_id, regexp_split_to_array(text, '[ \\t\\n\\r\\f]+') AS t FROM documents
    ), st AS (
      SELECT doc_id, t, unnest(range(1, len(t) + 1, {_P_STRIDE})) AS s FROM tok
    )
    SELECT doc_id,
           CAST((s - 1) / {_P_STRIDE} AS INTEGER) AS passage_idx,
           CAST(s AS INTEGER) AS tok_start,
           CAST(least(s + {_P_MAX} - 1, len(t)) AS INTEGER) AS tok_end,
           array_to_string(list_slice(t, s, least(s + {_P_MAX} - 1, len(t))), ' ')
             AS passage
    FROM st
    """,
)


# ---------------------------------------------------------------------------
# Q66 — banded hamming near-dup join over the 32-bit simhash: integer
# domain end-to-end, so the generic pigeonhole-banded join is
# hash-gated exactly (4 bands of 8 bits, distance budget 3).
# ---------------------------------------------------------------------------

_HAM_MAX = 3
# q66 uses a WIDER simhash than q34's 16-bit oracle form: 16 bits over
# thousands of similar docs puts most of the corpus within hamming 3
# (one 4-bit band bucket held 60% of sf0.1 — millions of true pairs),
# so near-dup detection needs bits to scale with corpus size.  32 bits
# keeps the pair set sparse at bench scale and the bands selective.
_Q66_BITS = 32


def q66_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = dedup.simhash(
        load_table(spark, sf_dir, "documents"), "text", "doc_id", bits=_Q66_BITS
    )
    return dedup.hamming_neardup_pairs(
        sh, "doc_id", "simhash", bits=_Q66_BITS, max_hamming=_HAM_MAX
    )


_q66_sums = ",\n           ".join(
    f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
    for b in range(_Q66_BITS)
)
_q66_pack = " + ".join(
    f"CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(_Q66_BITS)
)
_q66_bands = " UNION ALL ".join(
    f"SELECT doc_id, simhash, {b} AS band, (simhash >> {b * (_Q66_BITS // (_HAM_MAX + 1))}) & {(1 << (_Q66_BITS // (_HAM_MAX + 1))) - 1} AS val FROM sh"
    for b in range(_HAM_MAX + 1)
)
register(
    "q66_simhash_neardup",
    q66_simhash_neardup,
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
    ), hashes AS (
      SELECT doc_id, {hash64_sql('tok')} AS h FROM toks
    ), sums AS (
      SELECT doc_id, {_q66_sums} FROM hashes GROUP BY doc_id
    ), sh AS MATERIALIZED (
      SELECT d.doc_id, COALESCE(CAST({_q66_pack} AS BIGINT), 0) AS simhash
      FROM documents d LEFT JOIN sums s ON s.doc_id = d.doc_id
    ), banded AS MATERIALIZED ({_q66_bands}),
    pairs AS (
      SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2,
             l.simhash AS h1, r.simhash AS h2
      FROM banded l JOIN banded r
        ON l.band = r.band AND l.val = r.val AND l.doc_id < r.doc_id
    )
    SELECT id1, id2, CAST(bit_count(CAST(xor(h1, h2) AS BIGINT)) AS BIGINT) AS hamming
    FROM pairs WHERE bit_count(CAST(xor(h1, h2) AS BIGINT)) <= {_HAM_MAX}
    """,
)


# ---------------------------------------------------------------------------
# Q67 — CCNet-style corpus line dedup (operators/line_dedup.py).  The
# corpus is single-line word soup, so the query derives a deterministic
# multi-line view first: non-overlapping word PAIRS become the "lines"
# (identical construction in both engines), giving a realistic mix of
# boilerplate (frequent pairs) and content at the gate's min_docs.
# ---------------------------------------------------------------------------

_LD_MIN_DOCS = 20


def q67_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lsd2_spark.operators.line_dedup import remove_frequent_lines

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1, F.lit(2)),
            lambda i: F.concat(
                F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    lined = docs.select("doc_id", F.array_join(pairs, "\n").alias("text"))
    out = remove_frequent_lines(
        lined, "text", "doc_id", min_docs=_LD_MIN_DOCS
    )
    return out.select(
        "doc_id", "clean_text", "n_lines", "n_lines_removed", "n_chars_removed"
    )


_Q67_SQL = f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ), lt AS (
      -- the derived multi-line text, EXACTLY as the Spark side builds
      -- it; the operator then re-splits on the separator, so a token
      -- with an embedded newline yields MORE lines than pairs — the
      -- oracle must re-split the joined text, not count pairs
      SELECT doc_id,
             array_to_string(list_transform(range(1, len(tk), 2),
                    i -> tk[CAST(i AS INT)] || ' ' || tk[CAST(i + 1 AS INT)]),
                 chr(10)) AS ltext
      FROM t
    ), ln AS (
      SELECT doc_id, ltext, string_split(ltext, chr(10)) AS lines FROM lt
    ), pl AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos, lines[CAST(i AS INT)] AS line
      FROM ln, unnest(range(1, len(lines) + 1)) u(i)
    ), k AS MATERIALIZED (
      SELECT doc_id, pos, line,
             lower(trim(line, ' ' || chr(9) || chr(10) || chr(13) || chr(12))) AS key
      FROM pl
    ), f AS (
      SELECT key FROM k WHERE key <> ''
      GROUP BY key HAVING COUNT(DISTINCT doc_id) >= {_LD_MIN_DOCS}
    ), m AS (
      SELECT k.doc_id, k.pos, k.line, k.key, f.key IS NOT NULL AS boiler
      FROM k LEFT JOIN f ON k.key = f.key
    ), r AS (
      SELECT doc_id,
             COALESCE(string_agg(CASE WHEN NOT boiler THEN line END, chr(10) ORDER BY pos), '') AS clean_text,
             CAST(COUNT(*) FILTER (WHERE key <> '') AS BIGINT) AS n_lines,
             CAST(COUNT(*) FILTER (WHERE boiler AND key <> '') AS BIGINT) AS n_lines_removed,
             CAST(length(string_agg(line, chr(10) ORDER BY pos))
                  - length(COALESCE(string_agg(CASE WHEN NOT boiler THEN line END, chr(10) ORDER BY pos), ''))
               AS BIGINT) AS n_chars_removed
      FROM m GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(r.clean_text, '') AS clean_text,
           COALESCE(r.n_lines, 0) AS n_lines,
           COALESCE(r.n_lines_removed, 0) AS n_lines_removed,
           COALESCE(r.n_chars_removed, 0) AS n_chars_removed
    FROM documents d LEFT JOIN r ON d.doc_id = r.doc_id
    """

register("q67_line_dedup", q67_line_dedup, _Q67_SQL)


# ---------------------------------------------------------------------------
# Q68 — DSIR importance scoring (operators/dsir.py): hashed unigram+
# bigram log importance ratios of a target slice (doc_id % 7 == 0)
# against the whole pool, summed per document.  The oracle replays the
# full train+score pipeline — bucket histograms, add-1 smoothing,
# unseen-bucket default — in SQL; the per-doc sum is round6'd on both
# sides (log accumulation order differs between engines).
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 10_000


def q68_dsir_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lsd2_spark.operators.dsir import (
        dsir_score,
        featurize_buckets,
        train_dsir,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    target = docs.filter(F.col("doc_id") % 7 == 0)
    # featurize ONCE and cut lineage: target counts, raw counts, and
    # scoring are all aggregations over the same (_did, bucket) frame,
    # and they run in SEPARATE jobs (the model totals/ratios are
    # collected), so without the cut the tokenize+hash pass over the
    # corpus would run ~3x.  The cut is per-invocation — every call
    # recomputes from the parquet input.
    b = cut_lineage(featurize_buckets(docs, "text", "doc_id", _DSIR_BUCKETS))
    model = train_dsir(
        target, docs, "text", n_buckets=_DSIR_BUCKETS,
        target_buckets=b.filter(F.col("_did") % 7 == 0),
        raw_buckets=b,
    )
    out = dsir_score(docs, "text", "doc_id", model, buckets=b)
    return out.select(
        "doc_id",
        round6(F.col("dsir_logweight")).alias("dsir_logweight"),
        "n_ngrams",
    )


_Q68_SQL = f"""
    WITH tk AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[ \\t\\n\\r\\f]+'),
                         x -> x <> '') AS t
      FROM documents
    ), ng AS (
      SELECT doc_id, unnest(t) AS g FROM tk
      UNION ALL
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)),
                    i -> t[CAST(i AS INT)] || ' ' || t[CAST(i + 1 AS INT)])) AS g
      FROM tk
    ), b AS MATERIALIZED (
      SELECT doc_id, {hash64_sql('g')} % {_DSIR_BUCKETS} AS bucket FROM ng
    ), tcnt AS (
      SELECT bucket, COUNT(*) AS n FROM b WHERE doc_id % 7 = 0 GROUP BY bucket
    ), rcnt AS (
      SELECT bucket, COUNT(*) AS n FROM b GROUP BY bucket
    ), tot AS (
      SELECT (SELECT SUM(n) FROM tcnt) AS tt, (SELECT SUM(n) FROM rcnt) AS tr
    ), ratios AS MATERIALIZED (
      SELECT COALESCE(tcnt.bucket, rcnt.bucket) AS bucket,
             ln(COALESCE(tcnt.n, 0) + 1.0) - ln(tt + {float(_DSIR_BUCKETS)})
             - ln(COALESCE(rcnt.n, 0) + 1.0) + ln(tr + {float(_DSIR_BUCKETS)}) AS log_ratio
      FROM tcnt FULL JOIN rcnt ON tcnt.bucket = rcnt.bucket CROSS JOIN tot
    ), sc AS (
      SELECT b.doc_id,
             SUM(COALESCE(r.log_ratio,
                          ln(tot.tr + {float(_DSIR_BUCKETS)}) - ln(tot.tt + {float(_DSIR_BUCKETS)}))) AS w,
             COUNT(*) AS n
      FROM b LEFT JOIN ratios r ON b.bucket = r.bucket CROSS JOIN tot
      GROUP BY b.doc_id
    )
    SELECT d.doc_id,
           FLOOR(COALESCE(sc.w, 0.0) * 1000000.0 + 0.5) / 1000000.0 AS dsir_logweight,
           CAST(COALESCE(sc.n, 0) AS BIGINT) AS n_ngrams
    FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
    """

register("q68_dsir_score", q68_dsir_score, _Q68_SQL)


# ---------------------------------------------------------------------------
# Q69 — fuzzy decontamination (operators/decontam.py): word-3-gram
# shingle minhash over the salted-md5 exactly-minwise family, 16x1
# banding with the eval side (doc_id % 50 == 0) broadcast, exact
# shingle-Jaccard verify at 0.5, per-train argmax with smaller-eval-id
# tiebreak.  The oracle replays the IDENTICAL banding (deterministic
# salted hashes), so banding recall misses can never fork the gate.
# ---------------------------------------------------------------------------

_FZ_BANDS = 16
_FZ_MINJ = 0.5

_fz_mh_aggs = ",\n             ".join(
    f"MIN({hash64_sql(chr(39) + f'fz{j}' + chr(31) + chr(39) + ' || s')}) AS fmh{j}"
    for j in range(_FZ_BANDS)
)
_fz_bands = " UNION ALL ".join(
    f"SELECT doc_id, {j} AS band, fmh{j} % {MOD} AS bucket FROM sig"
    for j in range(_FZ_BANDS)
)


def q69_fuzzy_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lsd2_spark.operators.decontam import fuzzy_decontaminate

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ev = docs.filter(F.col("doc_id") % 50 == 0)
    out = fuzzy_decontaminate(
        docs, ev, "text", "doc_id", min_jaccard=_FZ_MINJ, n=3, bands=_FZ_BANDS
    )
    return out.select(
        "doc_id",
        F.col("fuzzy_contaminated").cast("int").alias("fuzzy_contaminated"),
        F.coalesce(F.col("matched_eval_id"), F.lit(-1)).alias("matched_eval_id"),
        round6(F.col("jaccard")).alias("jaccard"),
    )


_Q69_SQL = f"""
    WITH tok AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '[ \\t\\n\\r\\f]+') AS t
      FROM documents
    ), sh0 AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
                    i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS s
      FROM tok
    ), sh AS MATERIALIZED (
      SELECT DISTINCT doc_id, s FROM sh0
    ), sig AS (
      SELECT doc_id, {_fz_mh_aggs}
      FROM sh GROUP BY doc_id
    ), banded AS MATERIALIZED ({_fz_bands}),
    cand AS (
      SELECT DISTINCT t.doc_id AS tid, e.doc_id AS eid
      FROM banded t JOIN banded e ON t.band = e.band AND t.bucket = e.bucket
      WHERE e.doc_id % 50 = 0
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS ns FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT c.tid, c.eid, COUNT(*) AS shared
      FROM cand c
      JOIN sh a ON a.doc_id = c.tid
      JOIN sh b ON b.doc_id = c.eid AND a.s = b.s
      GROUP BY c.tid, c.eid
    ), ver AS (
      SELECT tid, eid, CAST(shared AS DOUBLE) / (sa.ns + sb.ns - shared) AS j
      FROM inter JOIN sizes sa ON sa.doc_id = tid
                 JOIN sizes sb ON sb.doc_id = eid
      WHERE CAST(shared AS DOUBLE) / (sa.ns + sb.ns - shared) >= {_FZ_MINJ}
    ), best AS (
      SELECT tid, eid, j FROM (
        SELECT tid, eid, j,
               ROW_NUMBER() OVER (PARTITION BY tid ORDER BY j DESC, eid ASC) AS rn
        FROM ver
      ) WHERE rn = 1
    )
    SELECT d.doc_id,
           CAST(best.tid IS NOT NULL AS INTEGER) AS fuzzy_contaminated,
           COALESCE(best.eid, -1) AS matched_eval_id,
           FLOOR(best.j * 1000000.0 + 0.5) / 1000000.0 AS jaccard
    FROM documents d LEFT JOIN best ON d.doc_id = best.tid
    """

register("q69_fuzzy_decontam", q69_fuzzy_decontam, _Q69_SQL)


# ---------------------------------------------------------------------------
# Q70 — clean_text pipeline (operators/text_normalize.py): mojibake
# repair -> NFC -> control-char strip.  The corpus is pure ASCII (so the
# base text is repair/NFC/strip-invariant); the query plants a FIXED
# damaged tail (UTF-8 bytes mis-decoded as latin-1, with NFD combining
# marks and ASCII control chars) whose repaired+NFC'd form is a known
# literal, computed once here with the stdlib — the oracle appends that
# literal and strips the control chars itself through the RE2 twin of
# strip_control_chars, so the gate exercises the full Arrow pipeline
# against an independently-evaluated expectation.
# ---------------------------------------------------------------------------

# " café naïve é fin" with é precomposed, ï and the second é as NFD
# combining sequences — spelled in escapes so the source file stays ASCII
_CLEAN_GOOD_TAIL = " caf\u00e9 nai\u0308ve e\u0301 fin"
_CLEAN_CTRL_PIECE = "\x01\x07 ok \x1b\x7f end"
#: what read_warc/a crawler would actually hand us: the UTF-8 bytes of
#: the good tail decoded as latin-1 (classic double-decode damage)
_CLEAN_RAW_TAIL = (
    _CLEAN_GOOD_TAIL.encode("utf-8").decode("latin-1") + _CLEAN_CTRL_PIECE
)


def _clean_nfc_tail() -> str:
    import unicodedata

    return unicodedata.normalize("NFC", _CLEAN_GOOD_TAIL + _CLEAN_CTRL_PIECE)


def q70_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lsd2_spark.operators.text_normalize import clean_text

    docs = load_table(spark, sf_dir, "documents")
    # ASCII-restrict the base text (identical byte-explicit class in
    # both engines) so the planted tail's whole-string repair roundtrip
    # is deterministic no matter what a future testdata generation puts
    # in documents.text — repair is all-or-nothing per string, so one
    # non-cp1252 codepoint in the base would flip the whole row's
    # expected output
    base = F.regexp_replace(F.col("text"), "[^\\x00-\\x7f]", "")
    aug = docs.select(
        "doc_id", F.concat(base, F.lit(_CLEAN_RAW_TAIL)).alias("text")
    )
    out = clean_text(aug, "text")
    return out.select(
        "doc_id",
        F.col("text").alias("clean_text"),
        F.col("mojibake_fixed").cast("int").alias("mojibake_fixed"),
    )


def _q70_sql() -> str:
    from lsd2_spark.operators.text_normalize import strip_control_chars_sql

    tail_lit = _clean_nfc_tail().replace("'", "''")
    cleaned = strip_control_chars_sql(
        f"regexp_replace(text, '[^\\x00-\\x7f]', '', 'g') || '{tail_lit}'"
    )
    return f"""
    SELECT doc_id,
           {cleaned} AS clean_text,
           CAST(1 AS INTEGER) AS mojibake_fixed
    FROM documents
    """


register("q70_clean_text", q70_clean_text, _q70_sql())


# ---------------------------------------------------------------------------
# Q71 — HTML→text extraction in the gate (VERDICT r9 item 3): each
# document is wrapped in a deterministic page (head with script/style
# to drop, a comment, block structure, an entity-escaped body and a
# fixed entity battery), run through the full html_to_text chain —
# element drops, comment removal, block→newline, tag strip with quoted
# '>' attributes, entity decode with &amp; last, whitespace
# normalization — and the oracle states the EXPECTED extraction in
# closed form (a string expression of doc_id and the sanitized body),
# so any stage regressing breaks the hash.  The sanitized body
# ([a-zA-Z0-9,. ] only, single-spaced) makes the closed form exact:
# extraction is the identity on it, and the fixed suffix/battery pins
# the escape round-trip (&amp;lt; -> literal &lt;, R&amp;D -> R&D,
# &lt;tag&gt; -> <tag>) plus &ndash;/&#x2019;/&quot;/&nbsp; decodes.
# ---------------------------------------------------------------------------


def q71_html_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lsd2_spark.operators.html_text import html_to_text

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 200),
                "[^a-zA-Z0-9,. ]",
                "",
            ),
            " +",
            " ",
        )
    )
    body = F.concat(F.lit("B "), cleaned, F.lit(" R&D <tag>"))
    esc = F.replace(body, F.lit("&"), F.lit("&amp;"))
    esc = F.replace(esc, F.lit("<"), F.lit("&lt;"))
    esc = F.replace(esc, F.lit(">"), F.lit("&gt;"))
    did = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit('<!DOCTYPE html><html><head><title>Doc '),
        did,
        F.lit(
            '</title><script type="text/javascript">var x = "1 > 0" < 2;'
            "</script><style>.c{color:red}</style></head><body>"
            '<!-- hidden comment --><h1 class="t">Doc '
        ),
        did,
        F.lit('</h1><p class="a" alt="5 > 4">'),
        esc,
        F.lit(
            "</p><br><p>&amp;lt; &ndash; &#x2019; &quot;q&quot;&nbsp;end</p>"
            "</body></html>"
        ),
    )
    out = html_to_text(
        docs.select("doc_id", html.alias("html")), "html", out_col="text"
    )
    return out.select("doc_id", "text")


# expected extraction, line by line: title -> 'Doc N', h1 -> 'Doc N',
# paragraph -> the unescaped body (collapse fixes the empty-cleaned
# double space), <br>+</p> -> the blank paragraph break, entity battery
# decoded (&amp;lt; survives as literal &lt; because &amp; decodes
# LAST; 0x2013/0x2019 are &ndash;/&#x2019;)
_Q71_SQL = """
WITH c AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(
           substr(coalesce(text, ''), 1, 200),
           '[^a-zA-Z0-9,. ]', '', 'g'), ' +', ' ', 'g')) AS cleaned
  FROM documents
)
SELECT doc_id,
       'Doc ' || CAST(doc_id AS VARCHAR) || chr(10) ||
       'Doc ' || CAST(doc_id AS VARCHAR) || chr(10) ||
       regexp_replace('B ' || cleaned || ' R&D <tag>', ' +', ' ', 'g') ||
       chr(10) || chr(10) ||
       '&lt; ' || chr(8211) || ' ' || chr(8217) || ' "q" end' AS text
FROM c
"""

register("q71_html_text", q71_html_text, _Q71_SQL)


# ---------------------------------------------------------------------------
# Q72 — BM25 retrieval in the gate (the backlog's "most SQL-replayable
# pytest-only operator"): top-50 documents for a fixed query, scored
# with the standard BM25+ idf over whitespace tokens.  Every float op
# is order-pinned: avgdl is an exact integer-valued sum over doubles
# divided once, idf/score chains evaluate left-associatively in both
# engines, and the final score goes through the round6 twin.  Ties at
# the k boundary break by doc_id in both engines.
# ---------------------------------------------------------------------------

_BM25_QUERY = "the data of system"
_BM25_K = 50


def q72_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lsd2_spark.operators.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, _BM25_QUERY, "text", "doc_id", k=_BM25_K)


_Q72_SQL = f"""
    WITH base AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '{WS}'),
                         x -> x IN ('the', 'data', 'of', 'system')) AS m,
             CAST(len(regexp_split_to_array(lower(text), '{WS}')) AS DOUBLE) AS dl
      FROM documents
    ), stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, SUM(dl) / COUNT(*) AS avgdl
      FROM base
    ), tf AS (
      SELECT doc_id, dl, term, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM (SELECT doc_id, dl, unnest(m) AS term FROM base)
      GROUP BY doc_id, dl, term
    ), dfq AS (
      SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term
    ), sc AS (
      SELECT doc_id,
             {round6_sql(
                 "SUM(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * tf * 2.2"
                 " / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))"
             )} AS score,
             COUNT(*) AS n_query_terms_matched
      FROM tf JOIN dfq USING (term) CROSS JOIN stats
      GROUP BY doc_id
    )
    SELECT doc_id, score, n_query_terms_matched
    FROM sc ORDER BY score DESC, doc_id LIMIT {_BM25_K}
    """

register("q72_bm25_topk", q72_bm25_topk, _Q72_SQL)


# ---------------------------------------------------------------------------
# Q73 — LM scoring, BOTH models (operators/lm_score.py), one row per
# document:
#
# - char-trigram LM: train the add-one-smoothed conditional table on
#   the doc_id % 5 == 0 reference slice, score every document (average
#   per-trigram log-prob; unseen trigrams take the fixed -12 floor);
# - word-bigram LM (the KenLM-shaped upgrade): Jelinek-Mercer
#   interpolation lam*ML(w2|w1) + (1-lam)*(c(w2)+1)/(T+V), unseen
#   words at the 1/(T+V) floor, trained on the same slice.
#
# The oracle replays BOTH train+score pipelines end-to-end in SQL —
# normalization, gram expansion, context totals, alphabet V / vocab
# T+V, the interpolation arithmetic with the exact Python float
# literal for (1-lam) — with each per-doc average round6'd on both
# sides (ln and float-sum order differ between engines; the FLOOR
# idiom absorbs it).  The word model's broadcast caps (max_vocab /
# max_bigrams) are non-binding at every gate scale (vocab and distinct
# bigrams are orders of magnitude below the defaults), so the oracle
# need not replay the top-N truncation.
# ---------------------------------------------------------------------------

_LM_N = 3
_LM_TRAIN_MOD = 5
_LM_FLOOR = -12.0  # keep in sync with operators.lm_score._UNSEEN_PENALTY


def q73_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lsd2_spark.operators.lm_score import (
        lm_score_combined,
        train_char_lm,
        train_word_lm,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % _LM_TRAIN_MOD == 0)
    # fused scoring: one aggregation exchange + one totality join for
    # both models, instead of (agg + totality) per model + a final
    # doc_id join — identical per-doc value multisets, oracle-replayed
    return lm_score_combined(
        docs,
        train_char_lm(train, "text", n=_LM_N),
        train_word_lm(train, "text"),
        "text",
        "doc_id",
        n=_LM_N,
    )


def _q73_sql() -> str:
    from lsd2_spark.operators.lm_score import _WLM_LAMBDA

    return f"""
    WITH norm AS (
      SELECT doc_id,
             regexp_replace(lower(text), '[ \\t\\n\\r\\f]+', ' ', 'g') AS nt
      FROM documents
    ), cn AS (
      SELECT doc_id, ' ' || nt AS t FROM norm
    ), g AS MATERIALIZED (
      SELECT doc_id, substr(t, CAST(i AS INT), {_LM_N}) AS gram
      FROM cn, unnest(range(1, length(t) - {_LM_N - 2})) u(i)
    ), m AS MATERIALIZED (
      SELECT gram, COUNT(*) AS c FROM g
      WHERE doc_id % {_LM_TRAIN_MOD} = 0 GROUP BY gram
    ), ctx AS (
      SELECT substr(gram, 1, {_LM_N - 1}) AS ctx, CAST(SUM(c) AS BIGINT) AS ctx_c
      FROM m GROUP BY 1
    ), v AS (
      SELECT COUNT(DISTINCT substr(gram, {_LM_N}, 1)) AS v FROM m
    ), lp AS MATERIALIZED (
      SELECT m.gram, ln((m.c + 1.0) / (ctx.ctx_c + v.v)) AS logp
      FROM m JOIN ctx ON substr(m.gram, 1, {_LM_N - 1}) = ctx.ctx CROSS JOIN v
    ), sc AS (
      SELECT g.doc_id, COUNT(*) AS n_grams,
             AVG(COALESCE(lp.logp, {_LM_FLOOR})) AS a
      FROM g LEFT JOIN lp ON g.gram = lp.gram GROUP BY g.doc_id
    ), wt AS MATERIALIZED (
      SELECT doc_id,
             list_filter(string_split('<s> ' || nt, ' '), x -> x <> '') AS wtk
      FROM norm
    ), wb AS MATERIALIZED (
      SELECT doc_id,
             wtk[CAST(i AS INT)] || ' ' || wtk[CAST(i + 1 AS INT)] AS bg,
             wtk[CAST(i + 1 AS INT)] AS w2
      FROM wt, unnest(range(1, len(wtk))) u(i)
    ), uni AS MATERIALIZED (
      SELECT w, COUNT(*) AS c FROM (
        SELECT unnest(wtk) AS w FROM wt WHERE doc_id % {_LM_TRAIN_MOD} = 0
      ) GROUP BY w
    ), st AS MATERIALIZED (
      SELECT CAST(SUM(c) AS BIGINT) AS t, COUNT(*) AS v FROM uni
    ), pu AS MATERIALIZED (
      SELECT w, (c + 1.0) / (st.t + st.v) AS p_uni FROM uni CROSS JOIN st
    ), bc AS MATERIALIZED (
      SELECT bg, COUNT(*) AS c12 FROM wb
      WHERE doc_id % {_LM_TRAIN_MOD} = 0 GROUP BY bg
    ), w1c AS (
      SELECT string_split(bg, ' ')[1] AS w1, CAST(SUM(c12) AS BIGINT) AS c1
      FROM bc GROUP BY 1
    ), pml AS MATERIALIZED (
      SELECT bc.bg, bc.c12 / w1c.c1 AS p_ml
      FROM bc JOIN w1c ON string_split(bc.bg, ' ')[1] = w1c.w1
    ), wsc AS (
      SELECT wb.doc_id, COUNT(*) AS n_bigrams,
             AVG(ln({_WLM_LAMBDA!r} * COALESCE(pml.p_ml, 0.0)
                    + {1.0 - _WLM_LAMBDA!r} * COALESCE(pu.p_uni,
                                                       1.0 / (st.t + st.v)))) AS a
      FROM wb LEFT JOIN pml ON wb.bg = pml.bg
              LEFT JOIN pu ON wb.w2 = pu.w
              CROSS JOIN st
      GROUP BY wb.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(sc.n_grams, 0) AS BIGINT) AS n_grams,
           {round6_sql('sc.a')} AS avg_logp,
           CAST(COALESCE(wsc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           {round6_sql('wsc.a')} AS word_avg_logp
    FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
                     LEFT JOIN wsc ON d.doc_id = wsc.doc_id
    """


register("q73_lm_score", q73_lm_score, _q73_sql())


# ---------------------------------------------------------------------------
# Q74 — the batch CURATION FUNNEL, gated end-to-end (VERDICT r10 next
# item #1; slot freed by the q58/q60 merge).  curate_corpus composes
# already-gated ingredients — clean_text (q70), the quality/lang profile
# (q36), exact dedup (q30), banded-LSH fuzzy dedup (q32/q46), n-gram
# decontamination (q63) — and this row certifies the COMPOSITION: the
# full tagged frame (per-doc first-failure ``drop_stage`` + ``kept``,
# null-verdict semantics for rows killed upstream, keep-best-quality
# fuzzy canonicals, duplicates-of-contaminated-canonical policy) plus
# the Gopher rule battery's metrics and flags (VERDICT item #8: the
# battery columns are hash-pinned here, per-doc) and the funnel
# report's stable six-row histogram, all in one gate row
# (``kind`` = 'doc' | 'report').
#
# Corpus construction (identical in both engines): documents' text
# ASCII-restricted (so clean_text's mojibake repair and NFC are
# provable no-ops — the q70 trick), planted exact duplicates
# (doc_id % 17 == 0 re-appended at doc_id + 1,000,000), and an eval set
# overlapping the corpus (doc_id % 20 == 0 — the realistic benchmark-
# leakage case), so every stage has victims: lang (docs without en
# markers), quality (docs without 'the', the only Gopher stopword in
# the generator's vocabulary, under min_stop_words=1), exact_dup (the
# plants), fuzzy_dup (the corpus's natural near-duplicate density at
# est-jaccard >= 0.75 — a NON-transitive threshold, so the CC fixpoint
# does real merging), contaminated (eval members that survive to stage
# D).  Because the corpus's own eval members usually die in the dedup
# stages before reaching stage D, a second plant family GUARANTEES
# contamination victims: probe docs (doc_id % 100 == 1, at
# doc_id + 2,000,000) built from doc_id-unique tokens — so they pass
# every row-local gate and form singleton fuzzy clusters (guaranteed
# canonical) — ending in a sentinel 5-gram that is also an eval row;
# and an exact COPY of each probe (doc_id + 2,500,000) that exercises
# the duplicate-of-contaminated-canonical policy: the copy drops as
# exact_dup while its canonical drops as contaminated.
# ---------------------------------------------------------------------------

_FUNNEL_JACCARD = 0.75  # agree >= 6/8 rows: non-transitive, real CC
_FUNNEL_CC_STEPS = 8  # oracle unroll cap (>= diameter; Spark runs to fixpoint)
_FUNNEL_MIN_WORDS = 10
_ASCII_SQL = "regexp_replace(text, '[^\\x00-\\x7f]', '', 'g')"
_FUNNEL_SENTINEL = "cq1 cq2 cq3 cq4 cq5"  # the planted eval 5-gram

#: the q74 battery surface: (column, spark type, duckdb type) — used to
#: build both the doc-row projection and the report rows' typed nulls
_FUNNEL_BATTERY = [
    ("n_words", "bigint", "BIGINT"),
    ("mean_word_len", "double", "DOUBLE"),
    ("hash_word_ratio", "double", "DOUBLE"),
    ("ellipsis_word_ratio", "double", "DOUBLE"),
    ("bullet_line_frac", "double", "DOUBLE"),
    ("ellipsis_line_frac", "double", "DOUBLE"),
    ("alpha_word_frac", "double", "DOUBLE"),
    ("n_stop_words", "int", "INTEGER"),
    ("words_ok", "int", "INTEGER"),
    ("word_len_ok", "int", "INTEGER"),
    ("symbol_ok", "int", "INTEGER"),
    ("bullet_ok", "int", "INTEGER"),
    ("ellipsis_ok", "int", "INTEGER"),
    ("alpha_ok", "int", "INTEGER"),
    ("stop_ok", "int", "INTEGER"),
    ("gopher_pass", "int", "INTEGER"),
    ("stopword_share", "double", "DOUBLE"),
    ("lexical_diversity", "double", "DOUBLE"),
    ("quality", "double", "DOUBLE"),
    ("bucket", "string", "VARCHAR"),
    ("lang_pred", "string", "VARCHAR"),
    ("lang_pass", "int", "INTEGER"),
    ("quality_pass", "int", "INTEGER"),
    ("exact_canonical", "int", "INTEGER"),
    ("fuzzy_canonical", "int", "INTEGER"),
    ("decontam_pass", "int", "INTEGER"),
]


# Synthetic-variant doc_id offset for q74/q75's planted corpora.  A
# 2^40-scale constant (not 1e6): organic doc_ids grow with the scale
# factor, and an offset inside their range would collide variant ids
# with organic docs — remove_repeated_spans rebuilds per input ROW
# while the DuckDB oracle groups by doc_id, so a collision is a real
# engine fork, not just a confusing id.  2^40 > any plausible corpus.
_VARIANT_OFF = 1 << 40


def q74_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lsd2_spark.operators.curate import curate_corpus, curation_report

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.regexp_replace(F.col("text"), "[^\\x00-\\x7f]", "").alias("text"),
    )
    # contamination probes: doc_id-unique tokens (pass every row-local
    # gate; singleton fuzzy clusters -> guaranteed canonical), sentinel
    # 5-gram tail that is also an eval row
    probe_text = F.concat_ws(
        " ",
        F.lit("the"),
        *[
            F.concat(F.lit("w"), F.col("doc_id").cast("string"), F.lit(ch))
            for ch in "abcdefgh"
        ],
        F.lit(_FUNNEL_SENTINEL),
    )
    probes = base.filter(F.col("doc_id") % 100 == 1).select(
        (F.col("doc_id") + 2 * _VARIANT_OFF).alias("doc_id"), probe_text.alias("text")
    )
    corpus = (
        base.unionByName(
            base.filter(F.col("doc_id") % 17 == 0).select(
                (F.col("doc_id") + _VARIANT_OFF).alias("doc_id"), "text"
            )
        )
        .unionByName(probes)
        .unionByName(  # exact copies: duplicate-of-contaminated-canonical
            probes.select((F.col("doc_id") + _VARIANT_OFF).alias("doc_id"), "text")
        )
    )
    ev = base.filter(F.col("doc_id") % 20 == 0).select("text").unionByName(
        spark.createDataFrame([(_FUNNEL_SENTINEL,)], "text string")
    )
    tagged = curate_corpus(
        corpus,
        eval_df=ev,
        languages=("en",),
        min_words=_FUNNEL_MIN_WORDS,
        fuzzy_min_jaccard=_FUNNEL_JACCARD,
        bands=4,
        decontam_n=5,
        min_stop_words=1,  # 'the' is the generator vocabulary's only
        # Gopher stopword; the paper's 2 would drop every document
    )
    # the doc-row and report branches both consume the tagged frame;
    # Spark re-executes common subplans per branch, so materialize once
    # — through cut_lineage so the session's lineage-cut conf (auto/
    # reliable on real clusters) governs this site like every other
    from lsd2_spark.operators.common import cut_lineage

    tagged = cut_lineage(tagged, eager=False)
    docrows = tagged.select(
        F.lit("doc").alias("kind"),
        F.col("doc_id"),
        *[F.col(c).cast(t).alias(c) for c, t, _ in _FUNNEL_BATTERY],
        F.col("drop_stage"),
        F.col("kept").cast("int").alias("kept"),
        F.lit(None).cast("long").alias("docs"),
    )
    report = curation_report(tagged).select(
        F.lit("report").alias("kind"),
        F.lit(None).cast("long").alias("doc_id"),
        *[F.lit(None).cast(t).alias(c) for c, t, _ in _FUNNEL_BATTERY],
        F.col("stage").alias("drop_stage"),
        F.lit(None).cast("int").alias("kept"),
        F.col("docs").cast("long").alias("docs"),
    )
    return docrows.unionByName(report)


def _q74_sql(steps: int = _FUNNEL_CC_STEPS) -> str:
    """``steps`` parameterizes the oracle's CC unroll depth (the gate
    registers the default).  Exposed so tests can prove the
    convergence guard FIRES: with ``steps=0`` the check compares fl1
    against the initial labels, which differ on any corpus with at
    least one fuzzy edge, so the CC_UNCONVERGED row must appear."""
    from lsd2_spark.operators.curate import FUNNEL_STAGES
    from lsd2_spark.operators.quality_rules import GOPHER_STOPWORDS
    from lsd2_spark.operators.text_normalize import strip_control_chars_sql

    ws = r"[ \t\n\r\f]+"
    trim = r"E' \t\n\r\f'"
    ctext = strip_control_chars_sql(_ASCII_SQL)
    gstops = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    agree6 = int(_FUNNEL_JACCARD * _K)  # 0.75 * 8 = 6, exact
    q_expr = "FLOOR((40.0 * diversity + 30.0 * stop_share + 30.0 * length_ok) * 1000000.0 + 0.5) / 1000000.0"
    bucket_exprs = ", ".join(
        f"mh{2*b} * {MOD} + mh{2*b+1} AS bucket{b}" for b in range(_K // 2)
    )
    band_union = " UNION ALL ".join(
        f"SELECT doc_id, {', '.join(f'mh{i}' for i in range(_K))}, {b} AS band, bucket{b} AS bucket FROM fsig"
        for b in range(_K // 2)
    )
    ngrams = (
        "unnest(list_transform(range(1, greatest(len(t) - 3, 1)), "
        "i -> array_to_string(list_slice(t, i, i + 4), ' ')))"
    )
    probe_sql = (
        "'the ' || "
        + " || ".join(
            f"'w' || CAST(doc_id AS VARCHAR) || '{ch} '" for ch in "abcdefgh"
        )
        + f" || '{_FUNNEL_SENTINEL}'"
    )
    # unroll one step PAST the cap: min-label propagation is monotone,
    # so fl{N+1} = fl{N} is exactly "fl{N} is the fixpoint" — the
    # convergence CTE below turns a too-shallow unroll into an explicit
    # CC_UNCONVERGED failure row instead of a silent spurious hash
    # mismatch against the Spark side (which runs to fixpoint)
    cc_steps, prev = [], "fl0"
    for i in range(1, steps + 2):
        cc_steps.append(f"""
    fl{i} AS MATERIALIZED (
      SELECT l.v, LEAST(l.lbl, COALESCE(m.nl, l.lbl)) AS lbl
      FROM {prev} l LEFT JOIN (
        SELECT e.a, MIN(p.lbl) AS nl FROM fe e JOIN {prev} p ON p.v = e.b GROUP BY e.a
      ) m ON m.a = l.v
    )""")
        prev = f"fl{i}"
    null_battery = ",\n           ".join(
        f"CAST(NULL AS {d}) AS {c}" for c, _, d in _FUNNEL_BATTERY
    )
    stage_values = ", ".join(f"('{s}')" for s in FUNNEL_STAGES + ["kept"])
    return f"""
    WITH corpus AS MATERIALIZED (
      SELECT doc_id, {ctext} AS text FROM documents
      UNION ALL
      SELECT doc_id + {_VARIANT_OFF} AS doc_id, {ctext} AS text
      FROM documents WHERE doc_id % 17 = 0
      UNION ALL
      SELECT doc_id + {2 * _VARIANT_OFF} AS doc_id, {probe_sql} AS text
      FROM documents WHERE doc_id % 100 = 1
      UNION ALL
      SELECT doc_id + {3 * _VARIANT_OFF} AS doc_id, {probe_sql} AS text
      FROM documents WHERE doc_id % 100 = 1
    ), t AS (
      SELECT doc_id, text,
             list_filter(regexp_split_to_array(text, '{ws}'), x -> x <> '') AS gtoks,
             regexp_split_to_array(text, '{ws}') AS qtoks,
             regexp_split_to_array(lower(text), '{ws}') AS ltoks,
             list_filter(string_split(text, chr(10)), l -> trim(l, {trim}) <> '') AS lines
      FROM corpus
    ), m AS MATERIALIZED (
      SELECT doc_id, text,
             len(gtoks) AS n_words,
             length(regexp_replace(text, '{ws}', '', 'g')) AS word_chars,
             len(regexp_extract_all(text, '#')) AS n_hash,
             len(regexp_extract_all(text, '\\.\\.\\.')) + len(regexp_extract_all(text, '…')) AS n_ell,
             len(lines) AS n_lines,
             len(list_filter(lines, l -> substr(trim(l, {trim}), 1, 1) IN ('-', '*', '•'))) AS bullet_lines,
             len(list_filter(lines, l -> ends_with(trim(l, {trim}), '...') OR ends_with(trim(l, {trim}), '…'))) AS ell_lines,
             len(list_filter(gtoks, x -> regexp_matches(x, '[A-Za-z]'))) AS alpha_words,
             len(list_intersect(list_distinct(list_transform(gtoks, x -> lower(x))), [{gstops}])) AS n_stop,
             CAST(len(list_filter(qtoks, x -> x IN ({_STOP_SQL}))) AS DOUBLE) / len(qtoks) AS stop_share,
             CAST(len(list_distinct(qtoks)) AS DOUBLE) / len(qtoks) AS diversity,
             CASE WHEN len(qtoks) BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END AS length_ok,
             {_hit_cols}
      FROM t
    ), v AS MATERIALIZED (
      SELECT doc_id, text,
             CAST(n_words AS BIGINT) AS n_words,
             CASE WHEN n_words > 0 THEN {round6_sql('CAST(word_chars AS DOUBLE) / n_words')} END AS mean_word_len,
             CASE WHEN n_words > 0 THEN {round6_sql('CAST(n_hash AS DOUBLE) / n_words')} END AS hash_word_ratio,
             CASE WHEN n_words > 0 THEN {round6_sql('CAST(n_ell AS DOUBLE) / n_words')} END AS ellipsis_word_ratio,
             CASE WHEN n_words > 0 AND n_lines > 0 THEN {round6_sql('CAST(bullet_lines AS DOUBLE) / n_lines')} END AS bullet_line_frac,
             CASE WHEN n_words > 0 AND n_lines > 0 THEN {round6_sql('CAST(ell_lines AS DOUBLE) / n_lines')} END AS ellipsis_line_frac,
             CASE WHEN n_words > 0 THEN {round6_sql('CAST(alpha_words AS DOUBLE) / n_words')} END AS alpha_word_frac,
             CAST(n_stop AS INTEGER) AS n_stop_words,
             (n_words > 0 AND n_words BETWEEN {_FUNNEL_MIN_WORDS} AND 100000) AS words_ok,
             (n_words > 0 AND CAST(word_chars AS DOUBLE) / n_words >= 3.0
                          AND CAST(word_chars AS DOUBLE) / n_words <= 10.0) AS word_len_ok,
             (n_words > 0 AND CAST(n_hash AS DOUBLE) / n_words <= 0.1
                          AND CAST(n_ell AS DOUBLE) / n_words <= 0.1) AS symbol_ok,
             (n_words > 0 AND n_lines > 0 AND CAST(bullet_lines AS DOUBLE) / n_lines <= 0.9) AS bullet_ok,
             (n_words > 0 AND n_lines > 0 AND CAST(ell_lines AS DOUBLE) / n_lines <= 0.3) AS ellipsis_ok,
             (n_words > 0 AND CAST(alpha_words AS DOUBLE) / n_words >= 0.8) AS alpha_ok,
             (n_words > 0 AND n_stop >= 1) AS stop_ok,
             (n_words > 0 AND n_words BETWEEN {_FUNNEL_MIN_WORDS} AND 100000
              AND CAST(word_chars AS DOUBLE) / n_words >= 3.0
              AND CAST(word_chars AS DOUBLE) / n_words <= 10.0
              AND CAST(n_hash AS DOUBLE) / n_words <= 0.1
              AND CAST(n_ell AS DOUBLE) / n_words <= 0.1
              AND n_lines > 0 AND CAST(bullet_lines AS DOUBLE) / n_lines <= 0.9
              AND CAST(ell_lines AS DOUBLE) / n_lines <= 0.3
              AND CAST(alpha_words AS DOUBLE) / n_words >= 0.8
              AND n_stop >= 1) AS gopher_pass,
             {round6_sql('stop_share')} AS stopword_share,
             {round6_sql('diversity')} AS lexical_diversity,
             {q_expr} AS quality,
             CASE WHEN {q_expr} >= 60 THEN 'good'
                  WHEN {q_expr} >= 30 THEN 'ok'
                  ELSE 'spam' END AS bucket,
             {_label} AS lang_pred,
             ({_label}) = 'en' AS lang_pass,
             (n_words > 0 AND n_words BETWEEN {_FUNNEL_MIN_WORDS} AND 100000
              AND CAST(word_chars AS DOUBLE) / n_words >= 3.0
              AND CAST(word_chars AS DOUBLE) / n_words <= 10.0
              AND CAST(n_hash AS DOUBLE) / n_words <= 0.1
              AND CAST(n_ell AS DOUBLE) / n_words <= 0.1
              AND n_lines > 0 AND CAST(bullet_lines AS DOUBLE) / n_lines <= 0.9
              AND CAST(ell_lines AS DOUBLE) / n_lines <= 0.3
              AND CAST(alpha_words AS DOUBLE) / n_words >= 0.8
              AND n_stop >= 1) AS quality_pass
      FROM m
    ), surv AS MATERIALIZED (
      SELECT doc_id, text, quality FROM v WHERE quality_pass AND lang_pass
    ), exact AS MATERIALIZED (
      SELECT doc_id,
             doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS exact_canonical
      FROM surv
    ), esurv AS MATERIALIZED (
      SELECT s.doc_id, s.text, s.quality
      FROM surv s JOIN exact e USING (doc_id) WHERE e.exact_canonical
    ), ftoks AS (
      SELECT doc_id, unnest(list_distinct(regexp_split_to_array(text, '{ws}'))) AS tok
      FROM esurv
    ), fhash AS (
      SELECT doc_id, {_TOKH_SQL} AS h FROM ftoks
    ), fsig0 AS (
      SELECT doc_id, {_mh_aggs} FROM fhash GROUP BY doc_id
    ), fsig AS MATERIALIZED (
      SELECT *, {bucket_exprs} FROM fsig0
    ), fbanded AS MATERIALIZED ({band_union}),
    fcand AS MATERIALIZED (
      SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2
      FROM fbanded l JOIN fbanded r
        ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
      WHERE CAST(({_agree}) AS DOUBLE) / {float(_K)} >= {_FUNNEL_JACCARD}
    ), fe AS MATERIALIZED (
      SELECT id1 AS a, id2 AS b FROM fcand
      UNION ALL
      SELECT id2 AS a, id1 AS b FROM fcand
    ), fl0 AS MATERIALIZED (
      SELECT doc_id AS v, CAST(doc_id AS BIGINT) AS lbl FROM esurv
    ),{','.join(cc_steps)},
    fbest AS MATERIALIZED (
      SELECT l.v AS doc_id,
             ROW_NUMBER() OVER (PARTITION BY l.lbl
                                ORDER BY s.quality DESC, l.v ASC) AS rn
      FROM {prev} l JOIN esurv s ON s.doc_id = l.v
    ), fuzzy AS MATERIALIZED (
      SELECT doc_id, rn = 1 AS fuzzy_canonical FROM fbest
    ), fsurv AS MATERIALIZED (
      SELECT s.doc_id, s.text FROM esurv s
      JOIN fuzzy f USING (doc_id) WHERE f.fuzzy_canonical
    ), evng AS MATERIALIZED (
      SELECT DISTINCT {ngrams} AS ngram
      FROM (SELECT regexp_split_to_array(lower({_ASCII_SQL}), '{ws}') AS t
            FROM documents WHERE doc_id % 20 = 0
            UNION ALL
            SELECT regexp_split_to_array('{_FUNNEL_SENTINEL}', '{ws}') AS t)
    ), trng AS (
      SELECT doc_id, {ngrams} AS ngram
      FROM (SELECT doc_id, regexp_split_to_array(lower(text), '{ws}') AS t FROM fsurv)
    ), hits AS MATERIALIZED (
      SELECT DISTINCT trng.doc_id FROM trng JOIN evng USING (ngram)
    ), dec AS MATERIALIZED (
      SELECT f.doc_id, h.doc_id IS NULL AS decontam_pass
      FROM fsurv f LEFT JOIN hits h ON h.doc_id = f.doc_id
    ), final0 AS MATERIALIZED (
      SELECT v.*, e.exact_canonical, f.fuzzy_canonical, d.decontam_pass,
             CASE WHEN NOT v.lang_pass THEN 'lang'
                  WHEN NOT v.quality_pass THEN 'quality'
                  WHEN NOT e.exact_canonical THEN 'exact_dup'
                  WHEN NOT f.fuzzy_canonical THEN 'fuzzy_dup'
                  WHEN NOT COALESCE(d.decontam_pass, TRUE) THEN 'contaminated'
             END AS drop_stage
      FROM v LEFT JOIN exact e USING (doc_id)
             LEFT JOIN fuzzy f USING (doc_id)
             LEFT JOIN dec d USING (doc_id)
    ), rep AS MATERIALIZED (
      SELECT COALESCE(drop_stage, 'kept') AS stage, COUNT(*) AS docs
      FROM final0 GROUP BY 1
    )
    SELECT 'doc' AS kind, doc_id,
           {', '.join(f'CAST({c} AS {d}) AS {c}' for c, _, d in _FUNNEL_BATTERY)},
           drop_stage, CAST(drop_stage IS NULL AS INTEGER) AS kept,
           CAST(NULL AS BIGINT) AS docs
    FROM final0
    UNION ALL
    SELECT 'report' AS kind, CAST(NULL AS BIGINT) AS doc_id,
           {null_battery},
           s.stage AS drop_stage, CAST(NULL AS INTEGER) AS kept,
           CAST(COALESCE(r.docs, 0) AS BIGINT) AS docs
    FROM (VALUES {stage_values}) s(stage) LEFT JOIN rep r ON r.stage = s.stage
    UNION ALL
    SELECT 'CC_UNCONVERGED_AFTER_{steps}_ROUNDS' AS kind,
           CAST(cnt AS BIGINT) AS doc_id, {null_battery},
           CAST(NULL AS VARCHAR) AS drop_stage, CAST(NULL AS INTEGER) AS kept,
           CAST(NULL AS BIGINT) AS docs
    FROM (SELECT COUNT(*) AS cnt
          FROM {prev} a JOIN fl{steps} b
            ON a.v = b.v AND a.lbl <> b.lbl)
    WHERE cnt > 0
    """


register("q74_curation_funnel", q74_curation_funnel, _q74_sql())


# ---------------------------------------------------------------------------
# Q75 — ExactSubstr repeated-substring scrubbing
# (operators/substring_dedup.py): the Lee et al. 2022 duplication mode
# that document-level dedup misses — long spans repeated VERBATIM
# inside otherwise-distinct documents.  The query plants the realistic
# victim shape on top of the organic corpus: a licence-boilerplate
# prefix welded onto 10% of documents (every variant shares the same
# 12-token header AND duplicates its source document's entire text),
# then scrubs every duplicated >=8-token window except its globally
# first occurrence and returns the rebuilt text + removal accounting.
# The Spark plan is one window-key shuffle (groupBy over token
# windows) + one per-document window-function interval merge + an
# array rebuild — no Python anywhere; the DuckDB oracle replays the
# identical semantics with window functions over the gram strings
# (grouping by the gram itself, where Spark keys the shuffle by
# xxhash64(gram) — identical up to 2^-64 collisions).

_ES_L = 8  # ExactSubstr window length (tokens)
_ES_BOILER = " ".join(f"lic{i:02d}" for i in range(12))


def _q75_substr_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lsd2_spark.operators.substring_dedup import remove_repeated_spans

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 10 == 3).select(
            (F.col("doc_id") + _VARIANT_OFF).alias("doc_id"),
            F.concat_ws(" ", F.lit(_ES_BOILER), F.col("text")).alias("text"),
        )
    )
    out = remove_repeated_spans(corpus, "text", "doc_id", min_tokens=_ES_L)
    return out.select(
        "doc_id",
        "clean_text",
        F.col("n_tokens_removed").cast("int").alias("n_tokens_removed"),
        F.col("n_spans").cast("int").alias("n_spans"),
    )


def _q75_sql() -> str:
    ws = r"[ \t\n\r\f]+"
    L = _ES_L
    return f"""
    WITH corpus AS MATERIALIZED (
      SELECT doc_id, text FROM documents
      UNION ALL
      -- concat_ws twin: Spark SKIPS null/absent args, so a NULL text
      -- yields the bare boilerplate (no trailing separator), while
      -- '||' would propagate the NULL and fork the engines
      SELECT doc_id + {_VARIANT_OFF} AS doc_id,
             CASE WHEN text IS NULL THEN '{_ES_BOILER}'
                  ELSE '{_ES_BOILER} ' || text END AS text
      FROM documents WHERE doc_id % 10 = 3
    ), t AS MATERIALIZED (
      SELECT doc_id, text, regexp_split_to_array(text, '{ws}') AS toks
      FROM corpus
    ), win AS MATERIALIZED (
      SELECT doc_id, s AS start,
             array_to_string(list_slice(toks, s, s + {L - 1}), ' ') AS gram
      FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - {L} + 2)) AS s
            FROM t WHERE len(toks) >= {L})
    ), marked AS MATERIALIZED (
      SELECT doc_id, start,
             COUNT(*) OVER (PARTITION BY gram) AS n,
             ROW_NUMBER() OVER (PARTITION BY gram
                                ORDER BY doc_id, start) AS rn
      FROM win
    ), removable AS MATERIALIZED (
      SELECT doc_id, start FROM marked WHERE n > 1 AND rn > 1
    ), spans AS MATERIALIZED (
      SELECT doc_id, MIN(start) AS s, MAX(start) + {L} AS e
      FROM (SELECT doc_id, start,
                   SUM(CASE WHEN prev IS NULL OR start - prev > {L}
                            THEN 1 ELSE 0 END)
                     OVER (PARTITION BY doc_id ORDER BY start
                           ROWS UNBOUNDED PRECEDING) AS sid
            FROM (SELECT doc_id, start,
                         LAG(start) OVER (PARTITION BY doc_id
                                          ORDER BY start) AS prev
                  FROM removable))
      GROUP BY doc_id, sid
    ), agg AS MATERIALIZED (
      SELECT doc_id, CAST(SUM(e - s) AS INTEGER) AS removed,
             CAST(COUNT(*) AS INTEGER) AS n_spans
      FROM spans GROUP BY doc_id
    ), tok_pos AS (
      SELECT doc_id, i, toks[i] AS tok
      FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i
            FROM t)
    ), kept AS (
      SELECT p.doc_id, p.i, p.tok
      FROM tok_pos p
      WHERE NOT EXISTS (SELECT 1 FROM spans s
                        WHERE s.doc_id = p.doc_id
                          AND p.i >= s.s AND p.i < s.e)
    ), rebuilt AS MATERIALIZED (
      SELECT doc_id, COALESCE(string_agg(tok, ' ' ORDER BY i), '') AS clean_text
      FROM kept GROUP BY doc_id
    )
    SELECT c.doc_id,
           CASE WHEN a.n_spans IS NOT NULL
                THEN COALESCE(r.clean_text, '')
                ELSE c.text END AS clean_text,
           COALESCE(a.removed, 0) AS n_tokens_removed,
           COALESCE(a.n_spans, 0) AS n_spans
    FROM corpus c
    LEFT JOIN agg a USING (doc_id)
    LEFT JOIN rebuilt r USING (doc_id)
    """


# MERGED into the q67 gate row (the gate surface is pinned at exactly
# 50 rows — COVERAGE.md merge discipline; a 51st registration would be
# silently truncated from the driver artifact).  q67_line_dedup below
# re-registers itself as the union of the line-dedup and exact-substr
# parts, replacing its round-9 single-part registration.


def q67_line_and_substr_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged gate row (round 12): CCNet line/paragraph dedup (the
    original q67) UNION the ExactSubstr repeated-span scrub — both are
    sub-document repeated-content removal with text rebuild, the same
    grain, disambiguated by ``kind``."""
    line = q67_line_dedup(spark, sf_dir)
    sub = _q75_substr_part(spark, sf_dir)
    return line.select(
        F.lit("line").alias("kind"),
        "doc_id",
        "clean_text",
        "n_lines",
        "n_lines_removed",
        "n_chars_removed",
        F.lit(None).cast("int").alias("n_tokens_removed"),
        F.lit(None).cast("int").alias("n_spans"),
    ).unionByName(
        sub.select(
            F.lit("substr").alias("kind"),
            "doc_id",
            "clean_text",
            F.lit(None).cast("long").alias("n_lines"),
            F.lit(None).cast("long").alias("n_lines_removed"),
            F.lit(None).cast("long").alias("n_chars_removed"),
            "n_tokens_removed",
            "n_spans",
        )
    )


_Q67_MERGED_SQL = f"""
    SELECT 'line' AS kind, q.doc_id, q.clean_text,
           q.n_lines, q.n_lines_removed, q.n_chars_removed,
           CAST(NULL AS INTEGER) AS n_tokens_removed,
           CAST(NULL AS INTEGER) AS n_spans
    FROM ({_Q67_SQL}) q
    UNION ALL
    SELECT 'substr' AS kind, s.doc_id, s.clean_text,
           CAST(NULL AS BIGINT) AS n_lines,
           CAST(NULL AS BIGINT) AS n_lines_removed,
           CAST(NULL AS BIGINT) AS n_chars_removed,
           s.n_tokens_removed, s.n_spans
    FROM ({_q75_sql()}) s
    """

register("q67_line_dedup", q67_line_and_substr_dedup, _Q67_MERGED_SQL)
