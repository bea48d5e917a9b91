"""Incremental deduplication against a persistent index.

The batch dedup operators (``dedup.py``) compare a corpus against
itself; a production pipeline almost never does that twice — it dedups
each NEW batch against everything already accepted.  This module
persists the dedup state as two engine-neutral parquet tables and
answers "is this new document a duplicate of anything in the corpus?"
with bounded joins:

- ``exact[.eN]/`` — (text_hash, canonical_id): one row per distinct
  content hash (md5 of the raw text, same key as
  ``dedup.exact_dedup``).
- ``bands[.eN]/`` — (band, bucket, id, mh0..mh{k-1}): the banded
  minhash signature table, hive-partitioned by ``band`` so a probe
  join prunes to the band partitions it needs.
- ``_dedup_index.json`` — {bands, k, text/id column names, epoch}.
  ``epoch`` versions the table directories (``.eN`` suffix, bare names
  at epoch 0): compact() writes the next epoch and atomically flips
  this pointer instead of renaming live directories.

Control-plane I/O (meta, compact staging/swap, crash healing) routes
through the same :class:`~lsd2_spark.sources.fs.LifecycleFS` seam as the
catalog lifecycle, so an object-store deployment injects its FS once and
the index holds the identical crash contract there: ``publish`` is the
only atomic primitive, renames may tear, and every recovery path is
re-runnable (see sources/fs.py's contract notes).  The data plane
(parquet reads/writes) already goes through Spark's Hadoop machinery.

At 100 TB: the index adds ~(k+2) small integers per accepted document
(~150 bytes; ~1.5 TB of index per 10 billion docs — parquet-compressed
far less).  A probe is two equi-joins — (text_hash) and
(band, bucket) — each shuffle-bounded by its key; hot buckets are
near-duplicate clusters and split by AQE like any skewed join.  No
step is all-pairs, nothing collects rows to the driver, and
``update()`` is an append-only parquet write (one shuffle on the band
key), so continuous ingest (``foreachBatch``) composes directly.

No reference parity: the reference engine has no dedup surface at all
(extension, like all of dedup.py).
"""

from __future__ import annotations

import json
import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lsd2_spark.functions.portable_hash import MINHASH_PERMS, MOD
from lsd2_spark.operators.dedup import minhash_signatures
from lsd2_spark.operators.common import spread_partitions
from lsd2_spark.sources.fs import LOCAL_FS, LifecycleFS

__all__ = ["DedupIndex"]

_META = "_dedup_index.json"


def _is_empty_table_error(e: AnalysisException) -> bool:
    """True only for the one AnalysisException an EMPTY index legally
    produces: a parquet directory with zero data files
    (UNABLE_TO_INFER_SCHEMA).  Any other analysis failure on a present
    table — schema drift across appended files, a corrupt footer
    surfacing at analysis — must propagate: treating it as an empty
    index would silently pass every probed document as fresh (ADVICE
    r10: match the error class, never bare AnalysisException)."""
    try:
        ec = e.getErrorClass()
    except Exception:  # pragma: no cover - legacy exception shapes
        ec = None
    if ec is not None:
        return ec == "UNABLE_TO_INFER_SCHEMA"
    # error-class-less legacy shape: fall back to the message token
    return "UNABLE_TO_INFER_SCHEMA" in str(e)


def _band_cols(k: int, bands: int):
    """(band, bucket) structs, packing rows-per-band signature values
    into one int64 bucket — the same packing lsh_candidate_pairs uses
    (MOD² < 2^40 keeps <=2 rows/band inside long range)."""
    rows_per_band = k // bands
    out = []
    for b in range(bands):
        parts = [F.col(f"mh{i}") for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        expr = parts[0]
        for p in parts[1:]:
            expr = expr * MOD + p
        out.append(F.struct(F.lit(b).alias("band"), expr.alias("bucket")))
    return out


class DedupIndex:
    """Persistent dedup state over an accepted corpus.

    >>> idx = DedupIndex.build(docs, "text", "doc_id", path)
    >>> flags = idx.probe(new_docs)     # exact_dup_of / near_dup_of
    >>> fresh = new_docs.join(flags.filter("exact_dup_of IS NULL AND "
    ...     "near_dup_of IS NULL"), "doc_id", "left_semi")
    >>> idx.update(fresh)               # accept the survivors
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        fs: LifecycleFS | None = None,
        gc_on_open: bool = False,
    ):
        """Open an existing index.  Opening is READ-ONLY: stale-epoch
        debris (crashed-compact staging or superseded dirs) is swept by
        ``compact()`` / ``fsck(repair=True)``, or here with
        ``gc_on_open=True`` — never by a plain open.  A destructive
        default would strengthen the single-WRITER assumption to
        single-process-ever: a probe-only open racing another process's
        compact (between its staging writes and the pointer flip, or
        right after the flip with a stale meta read) would rmtree
        staged or live table dirs (ADVICE r10)."""
        self.spark = spark
        self.path = path
        self._fs = fs or LOCAL_FS
        m = json.loads(self._fs.read_text(os.path.join(path, _META)))
        self.bands = int(m["bands"])
        self.k = int(m["k"])
        self.text_col = m["text_col"]
        self.id_col = m["id_col"]
        self.epoch = int(m.get("epoch", 0))
        if gc_on_open:
            self._gc_stale_epochs()

    # -- epoch-versioned table dirs -------------------------------------
    #
    # compact() NEVER renames or deletes the live tables in place — it
    # writes the rewritten tables to the NEXT epoch's directories and
    # atomically flips the meta pointer (``publish``, the one atomic
    # LifecycleFS primitive).  Directory renames are the one lifecycle
    # op with an unfixable object-store crash window: copy-then-delete
    # interrupted mid-DELETE leaves source partial and destination
    # complete, a state no marker protocol can tell apart from the
    # mirror image (source complete, destination partial) without
    # per-file manifests.  With the pointer flip, every crash window is
    # trivially safe: staged dirs are unreferenced until the flip,
    # the flip is atomic, and anything unreferenced is garbage the next
    # compact()/fsck(repair=True) sweeps (single-writer assumption,
    # like the rest of the lifecycle layer; plain opens are read-only
    # so probe-only processes never race a writer's staging).

    def _table_dir(self, name: str) -> str:
        suffix = "" if self.epoch == 0 else f".e{self.epoch}"
        return os.path.join(self.path, name + suffix)

    @property
    def exact_dir(self) -> str:
        return self._table_dir("exact")

    @property
    def bands_dir(self) -> str:
        return self._table_dir("bands")

    _TABLE_RE = r"^(exact|bands)(\.e(\d+))?$"

    def _gc_stale_epochs(self) -> None:
        """Remove table dirs not referenced by the current epoch: the
        debris of a compact that crashed before its pointer flip
        (staged next-epoch dirs) or after it (previous-epoch dirs).
        Idempotent, best-effort; the live tables are never touched."""
        import re

        try:
            names = self._fs.listdir(self.path)
        except FileNotFoundError:
            return
        for n in names:
            m = re.match(self._TABLE_RE, n)
            if m is None:
                continue
            ep = int(m.group(3)) if m.group(3) else 0
            if ep != self.epoch:
                self._fs.rmtree(os.path.join(self.path, n))

    def _publish_meta(self) -> None:
        meta = {
            "bands": self.bands,
            "k": self.k,
            "text_col": self.text_col,
            "id_col": self.id_col,
            "epoch": self.epoch,
        }
        self._fs.publish(os.path.join(self.path, _META), json.dumps(meta))

    # -- construction -------------------------------------------------

    @classmethod
    def build(
        cls,
        df: DataFrame,
        text_col: str,
        id_col: str,
        path: str,
        bands: int = 8,
        fs: LifecycleFS | None = None,
    ) -> "DedupIndex":
        """Create the index from an initial accepted corpus (may be
        empty).  ``bands`` must divide the signature length with at
        most 2 signature rows per band (bucket packing limit).
        ``fs`` injects the control-plane filesystem (object-store
        deployments); parquet I/O goes through Spark either way."""
        k = len(MINHASH_PERMS)
        if k % bands or k // bands > 2:
            raise ValueError(
                f"bands={bands} must divide k={k} with <=2 rows/band"
            )
        spark = df.sparkSession
        idx = cls.__new__(cls)
        idx.spark, idx.path = spark, path
        idx._fs = fs or LOCAL_FS
        idx.bands, idx.k = bands, k
        idx.text_col, idx.id_col = text_col, id_col
        idx.epoch = 0
        idx._fs.makedirs(path)
        idx._publish_meta()
        idx._write(df, mode="overwrite")
        return idx

    def _exact_rows(self, df: DataFrame) -> DataFrame:
        tc, ic = self.text_col, self.id_col
        return (
            df.select(
                F.md5(F.col(tc).cast("string")).alias("text_hash"),
                F.col(ic).alias("canonical_id"),
            )
            .groupBy("text_hash")
            .agg(F.min("canonical_id").alias("canonical_id"))
        )

    def _banded_rows(self, df: DataFrame) -> DataFrame:
        ic = self.id_col
        sig = minhash_signatures(spread_partitions(df), self.text_col, ic)
        return sig.withColumn(
            "_b", F.explode(F.array(*_band_cols(self.k, self.bands)))
        ).select(
            F.col("_b.band").alias("band"),
            F.col("_b.bucket").alias("bucket"),
            F.col(ic).alias("id"),
            *[f"mh{i}" for i in range(self.k)],
        )

    def _write(
        self, df: DataFrame, mode: str, exact_dir=None, bands_dir=None
    ) -> None:
        self._exact_rows(df).write.mode(mode).parquet(
            exact_dir or self.exact_dir
        )
        (
            self._banded_rows(df)
            .repartition("band")
            .write.mode(mode)
            .partitionBy("band")
            .parquet(bands_dir or self.bands_dir)
        )

    # -- empty-index-safe table readers --------------------------------
    #
    # An index built from an EMPTY corpus (the natural start of a
    # streaming ingest) has no parquet data files yet — partitionBy on
    # zero rows writes nothing — so a bare read fails with
    # UNABLE_TO_INFER_SCHEMA.  The fallback replays the exact _write
    # projections over an empty, probe-typed input frame, so the empty
    # view's schema matches what the first real update() will write BY
    # CONSTRUCTION (id type included), never by a hand-maintained copy.

    def _empty_corpus(self, id_type) -> DataFrame:
        from pyspark.sql.types import StringType, StructField, StructType

        return self.spark.createDataFrame(
            [],
            StructType(
                [
                    StructField(self.id_col, id_type),
                    StructField(self.text_col, StringType()),
                ]
            ),
        )

    def _read_exact(self, id_type=None) -> DataFrame:
        try:
            return self.spark.read.parquet(self.exact_dir)
        except AnalysisException as e:
            if (
                id_type is None
                or not _is_empty_table_error(e)
                or not self._fs.isdir(self.exact_dir)
            ):
                # a MISSING table dir is corruption (deleted, or a
                # legacy crash layout) and any analysis error other
                # than schema-less-empty-dir (e.g. schema drift across
                # appended files) is a DAMAGED table, not an empty
                # index — failing loud beats silently accepting every
                # duplicate
                raise
            return self._exact_rows(self._empty_corpus(id_type))

    def _read_bands(self, id_type=None) -> DataFrame:
        try:
            return self.spark.read.parquet(self.bands_dir)
        except AnalysisException as e:
            if (
                id_type is None
                or not _is_empty_table_error(e)
                or not self._fs.isdir(self.bands_dir)
            ):
                raise  # missing/damaged = corruption, not empty index
            return self._banded_rows(self._empty_corpus(id_type))

    # -- probing ------------------------------------------------------

    def probe(
        self,
        df: DataFrame,
        threshold: float = 0.8,
        exclude_ids: DataFrame | None = None,
    ) -> DataFrame:
        """Annotate every row of ``df``: ``exact_dup_of`` (canonical id
        of identical content, else NULL), ``near_dup_of`` (the best
        near-duplicate already in the index with signature agreement
        >= ``threshold``, smallest id on ties, else NULL) and its
        ``est_jaccard``.  Total: every input row comes back exactly
        once, including NULL text.

        ``exclude_ids`` (a one-column DataFrame of ids) masks those ids
        out of the index view for THIS probe — the replay-idempotency
        hook for streaming ingest: when a crashed micro-batch re-runs,
        its own survivors are already indexed, and without the mask
        other batch members that near-match them would be rejected on
        the re-run but not the original (streaming/corpus.py).  The
        mask is a broadcast anti-join on both index tables, probe-batch
        sized.

        Plan shape: one broadcast-or-shuffle hash join on text_hash +
        one equi-join on (band, bucket) pruned to the probed band
        partitions, then a per-probe-id partial-agg max.  Never
        all-pairs."""
        tc, ic = self.text_col, self.id_col
        spark = self.spark
        excl = (
            F.broadcast(
                exclude_ids.select(F.col(exclude_ids.columns[0]).alias("_xid"))
            )
            if exclude_ids is not None
            else None
        )
        exact = self._read_exact(id_type=df.schema[ic].dataType)
        if excl is not None:
            exact = exact.join(
                excl, exact["canonical_id"] == excl["_xid"], "left_anti"
            )
        # Explicit partition predicate on the hive-partitioned bands/
        # table: the probe only ever joins bands 0..bands-1, and spelling
        # that as a static filter puts it in the scan's PartitionFilters
        # (plan-asserted in tests) — at scale the probe reads exactly the
        # probed band directories, never a stale/foreign partition, and
        # the guarantee doesn't depend on dynamic partition pruning
        # firing against the exploded probe side.
        bandtab = self._read_bands(id_type=df.schema[ic].dataType).filter(
            F.col("band").isin(list(range(self.bands)))
        )
        if excl is not None:
            bandtab = bandtab.join(
                excl, bandtab["id"] == excl["_xid"], "left_anti"
            )

        probe = df.select(
            F.col(ic), F.md5(F.col(tc).cast("string")).alias("text_hash")
        )
        # exact/ may hold several rows per hash after appends; aggregate
        # AFTER the join so the groupBy is probe-sized, not index-sized
        ex = (
            probe.join(exact, "text_hash", "left")
            .groupBy(ic)
            .agg(F.min("canonical_id").alias("exact_dup_of"))
        )

        sig = minhash_signatures(spread_partitions(df), tc, ic)
        banded = sig.withColumn(
            "_b", F.explode(F.array(*_band_cols(self.k, self.bands)))
        ).select(
            F.col(ic).alias("_pid"),
            F.col("_b.band").alias("band"),
            F.col("_b.bucket").alias("bucket"),
            *[F.col(f"mh{i}").alias(f"p_mh{i}") for i in range(self.k)],
        )
        agree = sum(
            F.when(F.col(f"p_mh{i}") == F.col(f"mh{i}"), 1).otherwise(0)
            for i in range(self.k)
        )
        from pyspark.sql.window import Window

        # best match = highest agreement, smallest id on ties.  A
        # window row_number is type-agnostic over the id column (a
        # negated-id max(struct) would break for string ids); the
        # window input is the probe-sized thresholded candidate set, a
        # pair sharing several bands collapses to its first row.
        w = Window.partitionBy("_pid").orderBy(
            F.desc("_sim"), F.asc("_cid")
        )
        cand = (
            banded.join(bandtab, ["band", "bucket"])
            .filter(F.col("_pid") != F.col("id"))
            .select(
                F.col("_pid"),
                F.col("id").alias("_cid"),
                (agree.cast("double") / F.lit(float(self.k))).alias("_sim"),
            )
            .filter(F.col("_sim") >= threshold)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                F.col("_pid").alias(ic),
                F.col("_cid").alias("near_dup_of"),
                F.col("_sim").alias("est_jaccard"),
            )
        )
        return (
            df.select(ic)
            .join(ex, ic, "left")
            .join(cand, ic, "left")
            .select(ic, "exact_dup_of", "near_dup_of", "est_jaccard")
        )

    # -- incremental update -------------------------------------------

    def update(self, accepted: DataFrame) -> None:
        """Append newly-accepted documents to the index (append-only
        parquet; one shuffle on the band key).  Duplicate text hashes
        across updates are tolerated: probes aggregate min(canonical_id)
        per hash at read time, so a re-appended hash only costs index
        bytes, never correctness.  Compact by rebuilding if update
        batches were pathological."""
        self._write(accepted, mode="append")

    def probe_exact_reads_min(self) -> DataFrame:
        """exact/ may hold several rows per hash after updates; the
        canonical view aggregates to min — exposed for fsck-style
        audits."""
        return (
            self._read_exact()
            .groupBy("text_hash")
            .agg(F.min("canonical_id").alias("canonical_id"))
        )

    def fsck(self, repair: bool = False) -> dict:
        """Consistency report for the on-disk index (the DedupIndex
        twin of the catalog's fsck): current epoch, whether both live
        table dirs exist, any orphan epoch dirs (debris of a crashed
        compact — plain opens are READ-ONLY and never sweep them;
        sweeps happen only via ``compact()``, ``fsck(repair=True)``,
        or opening with ``gc_on_open=True``), row counts, and the
        duplicate-hash backlog
        (rows `compact()` would collapse; they cost bytes, never
        correctness — probes aggregate min per hash)."""
        import re

        report: dict = {"epoch": self.epoch}
        report["exact_dir_present"] = self._fs.isdir(self.exact_dir)
        report["bands_dir_present"] = self._fs.isdir(self.bands_dir)
        orphans = []
        try:
            for n in self._fs.listdir(self.path):
                m = re.match(self._TABLE_RE, n)
                if m is not None:
                    ep = int(m.group(3)) if m.group(3) else 0
                    if ep != self.epoch:
                        orphans.append(n)
        except FileNotFoundError:
            pass
        report["orphan_dirs"] = sorted(orphans)
        if repair and orphans:
            self._gc_stale_epochs()
            report["repaired"] = True
        try:
            exact = self._read_exact()
            n_rows = exact.count()
            n_hashes = exact.select("text_hash").distinct().count()
            report["exact_rows"] = n_rows
            report["duplicate_hash_backlog"] = n_rows - n_hashes
            report["bands_rows"] = self._read_bands().count()
        except AnalysisException as e:
            if not _is_empty_table_error(e):
                raise  # damaged table: an fsck must not report it fine
            # empty index (no data files yet) — structurally fine
            report["exact_rows"] = 0
            report["duplicate_hash_backlog"] = 0
            report["bands_rows"] = 0
        report["healthy"] = (
            report["exact_dir_present"]
            and report["bands_dir_present"]
            and not (orphans and not repair)
        )
        return report

    def compact(self) -> None:
        """Rewrite both tables from their current contents: collapses
        duplicate text-hash rows accumulated by updates and re-packs
        band partition files.  One read+shuffle+write per table —
        run it like any table-maintenance job, frequency set by update
        churn.

        Crash safety is the epoch pointer flip (see the class-level
        comment at :meth:`_table_dir`): both rewrites land in the NEXT
        epoch's directories — unreferenced until the flip — then one
        atomic ``publish`` of the meta moves the pointer, then the old
        epoch's dirs are garbage.  No live table is ever renamed,
        deleted-then-replaced, or read half-written: a crash before the
        flip leaves the old epoch serving (staged dirs swept later), a
        crash after it leaves the new epoch serving (old dirs swept
        later).  The one atomicity requirement is ``publish`` — exactly
        the LifecycleFS contract object stores can honor."""
        self._gc_stale_epochs()
        try:
            exact = self.probe_exact_reads_min()
            bands = self._read_bands()
        except AnalysisException as e:
            if not _is_empty_table_error(e) or not (
                self._fs.isdir(self.exact_dir)
                and self._fs.isdir(self.bands_dir)
            ):
                raise  # missing/damaged table dir = corruption, fail loud
            return  # empty index (no data files yet): nothing to compact
        new_epoch = self.epoch + 1
        tmp_e = os.path.join(self.path, f"exact.e{new_epoch}")
        tmp_b = os.path.join(self.path, f"bands.e{new_epoch}")
        exact.write.mode("overwrite").parquet(tmp_e)
        (
            bands.dropDuplicates(["band", "bucket", "id"])
            .repartition("band")
            .write.mode("overwrite")
            .partitionBy("band")
            .parquet(tmp_b)
        )
        old_exact, old_bands = self.exact_dir, self.bands_dir
        self.epoch = new_epoch
        self._publish_meta()  # THE atomic flip: readers move with it
        self._fs.rmtree(old_exact)
        self._fs.rmtree(old_bands)
