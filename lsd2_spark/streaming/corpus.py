"""Streaming corpus curation: incremental deduplication of a document
stream against the persistent :class:`~lsd2_spark.operators.dedup_index.
DedupIndex` — the streaming twin of the batch dedup story, and the
shape a 100 TB continuously-crawled corpus actually needs (each arriving
shard must be screened against EVERYTHING accepted so far, not just
against itself).

Per micro-batch (``foreachBatch``, batches applied serially):

1. **Within-batch exact dedup** — keep the smallest id per text md5
   (deterministic under replay).  With ``within_batch="fuzzy"``, the
   batch additionally runs :func:`~lsd2_spark.operators.dedup.
   dedup_clusters` so near-duplicate pairs FIRST SEEN in the same batch
   collapse immediately; with the default ``"exact"`` such a pair both
   survive this batch and the loser is only caught when a third copy
   arrives (documented cost: bounded by per-batch near-dup density;
   production crawls set fuzzy on).
2. **Probe the index** — exact (md5 join) + near (banded minhash,
   partition-pruned to the probed bands) against the accepted corpus;
   rows with any hit are rejected.
3. **Accept the survivors** — append their signatures to the index and
   write their full rows to ``accept_dir/batch_id=N/``.

Exactly-once under ``foreachBatch`` replay: a high-water batch_id
marker inside the index directory makes replayed batches no-ops; a
crash AFTER the index update but BEFORE the marker re-runs the batch,
which re-writes the same survivor rows to the same ``batch_id=N``
directory (overwrite, idempotent) and re-appends the same signatures —
the index tolerates duplicate appends by design (probes aggregate
``min(canonical_id)`` per hash; dedup_index.py:243).  The replay
wrinkle: survivors of the crashed attempt are already IN the index
when the batch re-probes, so each would reject itself — and, worse,
other batch members that near-match them would be rejected on the
re-run but not the original.  The re-probe therefore masks EXACTLY the
crashed attempt's survivor set out of the index view
(``DedupIndex.probe(exclude_ids=...)``), recreating the view the
attempt saw, so the re-run reproduces its verdicts.

Two fences make that mask precise:

- an INFLIGHT marker (``_stream_inflight.json``, published via the
  index's LifecycleFS — its one atomic primitive — BEFORE the index
  update, removed at commit) scopes the mask to genuine replays.
  Without it, a NEW batch re-delivering an id the index already holds
  (a re-crawl emitting the same doc_id) would mask out exactly the
  index row that should reject it and self-approve the duplicate.
- the mask CONTENT is the batch's accept directory, not the batch's
  full id list: only accepted survivors can be in the index, and
  masking the whole batch would hide OLDER index entries sharing an id
  with any re-delivered batch row.  The marker's ``accepted`` bit —
  flipped strictly after the accept write returns and strictly before
  the index update — is the module's own durable record that the
  directory is complete (Spark's ``_SUCCESS`` is not relied on: object
  stores commonly disable it, and it lives on the wrong filesystem).

Requires ids to be unique per distinct document (the same id arriving
twice means the same document).  All markers route through the index's
``LifecycleFS``, so the exactly-once contract holds on object stores
too."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_dedup_into_index", "StreamingDedupIndexWriter"]

_HWM = "_stream_hwm.json"
_INFLIGHT = "_stream_inflight.json"


def stream_dedup_into_index(
    docs_stream: DataFrame,
    index,
    accept_dir: str,
    threshold: float = 0.8,
    within_batch: str = "exact",
    min_jaccard: float = 0.9,
) -> "StreamingDedupIndexWriter":
    """Wire a streaming documents DataFrame (must carry the index's
    text/id columns) through the per-batch screen described in the
    module docstring.  Returns a writer: ``.start(checkpoint_dir)`` /
    ``.run_available(checkpoint_dir)``; accepted rows land in
    ``accept_dir/batch_id=N/`` and the index grows in place.

    ``threshold`` is the index near-dup signature agreement cutoff;
    ``min_jaccard`` is the within-batch fuzzy clustering cutoff (used
    only with ``within_batch="fuzzy"``)."""
    if within_batch not in ("exact", "fuzzy"):
        raise ValueError(
            f"within_batch must be 'exact' or 'fuzzy', got {within_batch!r}"
        )
    return StreamingDedupIndexWriter(
        docs_stream, index, accept_dir, threshold, within_batch, min_jaccard
    )


class StreamingDedupIndexWriter:
    def __init__(
        self,
        docs_stream: DataFrame,
        index,
        accept_dir: str,
        threshold: float,
        within_batch: str,
        min_jaccard: float,
    ) -> None:
        self._stream_df = docs_stream
        self.index = index
        self.accept_dir = accept_dir
        self.threshold = threshold
        self.within_batch = within_batch
        self.min_jaccard = min_jaccard
        #: (batch_id, rows_in, rows_accepted) per applied batch
        self.stats: list[tuple[int, int, int]] = []

    # -- exactly-once marker -------------------------------------------

    def _hwm_path(self) -> str:
        return os.path.join(self.index.path, _HWM)

    def _last_committed(self) -> int:
        # routed through the index's LifecycleFS: the marker must live
        # next to the index it fences, including on object stores
        try:
            blob = self.index._fs.read_text(self._hwm_path())
        except FileNotFoundError:
            return -1
        return int(json.loads(blob)["last_batch_id"])

    def _commit(self, batch_id: int) -> None:
        self.index._fs.publish(
            self._hwm_path(), json.dumps({"last_batch_id": int(batch_id)})
        )
        try:
            self.index._fs.remove(self._inflight_path())
        except FileNotFoundError:
            pass

    # -- inflight fence: scopes the replay mask to genuine replays ------
    #
    # Two-phase marker, both phases via the index FS's atomic publish:
    # {"batch_id": N, "accepted": false} lands BEFORE the accept-dir
    # write, flips to "accepted": true strictly AFTER that write
    # returns and strictly BEFORE the index update.  The accepted bit
    # is therefore this module's OWN durable record that the accept
    # dir is complete — independent of Spark's _SUCCESS marker, which
    # object-store deployments commonly disable
    # (mapreduce.fileoutputcommitter.marksuccessfuljobs=false) and
    # which lives on the accept dir's filesystem rather than the
    # index's.

    def _inflight_path(self) -> str:
        return os.path.join(self.index.path, _INFLIGHT)

    def _inflight_state(self) -> tuple[int, bool]:
        try:
            blob = self.index._fs.read_text(self._inflight_path())
        except FileNotFoundError:
            return -1, False
        m = json.loads(blob)
        return int(m["batch_id"]), bool(m.get("accepted", False))

    def _mark_inflight(self, batch_id: int, accepted: bool) -> None:
        self.index._fs.publish(
            self._inflight_path(),
            json.dumps({"batch_id": int(batch_id), "accepted": accepted}),
        )

    def _crashed_attempt_survivors(self, batch_df, batch_id: int):
        """The exclude mask for a replayed batch: the survivor ids the
        crashed attempt accepted (and may have indexed), read back from
        its accept directory.  Returns None (no mask) for fresh batches
        and for replays whose crash predates the accepted-marker flip —
        in both cases the index holds nothing of this batch (the index
        update runs strictly after the flip).  Determinism: the
        attempt's survivor set is a pure function of the batch and the
        index view it probed; masking exactly that set recreates the
        view, so the re-run reproduces it."""
        if self._inflight_state() != (batch_id, True):
            return None
        prior = os.path.join(self.accept_dir, f"batch_id={int(batch_id)}")
        return (
            batch_df.sparkSession.read.parquet(prior)
            .select(self.index.id_col)
        )

    # -- the batch screen ----------------------------------------------

    def _apply(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= self._last_committed():
            return  # replayed batch: already fully applied
        if batch_df.isEmpty():
            self._commit(batch_id)
            return
        tc, ic = self.index.text_col, self.index.id_col
        n_in = batch_df.count()

        # 1. within-batch screen (the standalone exact_dedup operator —
        #    same hash normalization as the index's own text_hash)
        from lsd2_spark.operators.dedup import exact_dedup

        batch = batch_df.join(
            exact_dedup(batch_df, tc, ic)
            .filter("is_canonical = 1")
            .select(ic),
            ic,
            "left_semi",
        )
        if self.within_batch == "fuzzy":
            from lsd2_spark.operators.dedup import dedup_clusters

            canon = dedup_clusters(
                batch, tc, ic, min_jaccard=self.min_jaccard
            ).filter("is_canonical = 1")
            batch = batch.join(canon.select(ic), ic, "left_semi")

        # 2. probe the accepted corpus.  ONLY on a genuine replay (the
        #    inflight fence reads (this batch, accepted=true): crash
        #    between index update and commit) is a mask applied — and
        #    the mask is the crashed attempt's SURVIVOR set (read back
        #    from this batch's accept directory, complete by the
        #    accepted-marker ordering), not the whole batch: those are
        #    the only rows that may already be indexed, and masking
        #    anything more would hide OLDER index entries that share an
        #    id with a batch row (a re-delivered document) from the
        #    very probe that must reject it.  A fresh batch probes
        #    unmasked.  accepted=false on replay means the crash hit
        #    before any index mutation: probe unmasked.
        mask = self._crashed_attempt_survivors(batch_df, batch_id)
        flags = self.index.probe(
            batch, threshold=self.threshold, exclude_ids=mask
        )
        clean = flags.filter(
            F.col("exact_dup_of").isNull() & F.col("near_dup_of").isNull()
        )
        survivors = batch.join(clean.select(ic), ic, "left_semi")
        # cut the multi-action plan once: written, indexed, and counted.
        # Mode comes from the session conf (CONF_LINEAGE_CUT): "auto"
        # resolves to "reliable" whenever the job set a checkpoint dir,
        # so a lost executor between the cut and the batch commit can't
        # kill the query; "local" otherwise.  The cut is batch-scoped —
        # once the batch commits, nothing re-reads it — so a reliable
        # checkpoint is DELETED after commit: without that, a long-
        # lived stream writes one corpus-scale snapshot per micro-batch
        # into the job store and never reclaims any.
        from lsd2_spark.operators.common import (
            checkpoint_file_of,
            cut_lineage,
            remove_checkpoint_file,
            resolve_cut_mode,
        )

        cut_mode = resolve_cut_mode(survivors.sparkSession)
        survivors = cut_lineage(survivors, mode=cut_mode, eager=True)
        batch_ckpt = checkpoint_file_of(
            survivors, expect_reliable=(cut_mode == "reliable")
        )

        # 3. accept: fence first (the marker must be durable BEFORE any
        #    index mutation, so every state where this batch's rows are
        #    indexed-but-uncommitted carries it), then the idempotent
        #    per-batch directory, then the index append.  When the
        #    replay's mask came FROM a complete accept dir, do NOT
        #    rewrite it: the recomputed survivor set equals its
        #    contents (determinism note in _crashed_attempt_survivors),
        #    and overwrite would delete the only record of the crashed
        #    attempt's acceptances — a second crash mid-rewrite would
        #    leave a torn dir whose next replay (were the accepted bit
        #    ever reset) would probe unmasked, self-reject every
        #    survivor, and strand the batch's documents: signatures
        #    indexed, corpus rows gone, all future copies silently
        #    rejected.
        if mask is None:
            self._mark_inflight(batch_id, accepted=False)
            survivors.write.mode("overwrite").parquet(
                os.path.join(self.accept_dir, f"batch_id={int(batch_id)}")
            )
            self._mark_inflight(batch_id, accepted=True)
        # on a masked replay the marker already reads (batch_id, true)
        # and MUST keep doing so — resetting accepted would, after one
        # more crash, send the next replay down the unmasked branch
        # against an index that already holds this batch
        self.index.update(survivors)
        self.stats.append((int(batch_id), int(n_in), int(survivors.count())))
        self._commit(batch_id)
        # the batch is committed — its checkpoint blocks are dead; free
        # the job store before the next micro-batch
        if batch_ckpt is not None:
            remove_checkpoint_file(survivors.sparkSession, batch_ckpt)

    # -- drivers ---------------------------------------------------------

    def start(self, checkpoint_dir: str):
        return (
            self._stream_df.writeStream.foreachBatch(self._apply)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )

    def run_available(self, checkpoint_dir: str) -> None:
        """Process everything currently available, synchronously."""
        q = self.start(checkpoint_dir)
        q.processAllAvailable()
        q.stop()
