"""Streaming corpus statistics recorder: per-micro-batch fixed-grid
histogram counts persisted to the lake — the monitoring tier of the
ingest path.

The drift question ("did src7's length profile shift this crawl?") must
not rescan the corpus per answer. Because the bin grid is FIXED,
per-batch (group, bin, cnt) tables are losslessly mergeable (sum of
counts == counts of the union), so each micro-batch appends only its own
O(groups × bins) count rows as a SEGMENT — the same O(batch) append +
batch-id idempotency contract as the near-dup ingest gate
(streaming/ingest.py) — and any later drift or trend query folds bin
counts instead of touching documents. ``drift()`` replays the exact
histogram_drift statistics from the persisted table
(operators/pipeline.py:histogram_drift_from_counts — pinned equal to the
direct corpus computation in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from py_gtfs_duckdb_spark.lake import GtfsLake
from py_gtfs_duckdb_spark.operators.pipeline import (
    histogram_counts,
    histogram_drift_from_counts,
    histogram_quantiles_from_counts,
)


class HistogramStatsRecorder:
    """``foreachBatch`` target (composes with the ingest gate in the same
    batch function): append each batch's (group, bin, cnt) histogram to
    ``<table>`` and answer drift queries from the accumulated counts."""

    def __init__(
        self,
        lake: GtfsLake,
        table: str = "corpus_hist",
        value_col: str = "n_tokens",
        by: str = "source",
        n_bins: int = 32,
        lo: float = 0.0,
        hi: float = 256.0,
        fold_every: int | None = None,
    ) -> None:
        self.lake = lake
        self.table = table
        self.value_col = value_col
        self.by = by
        self.n_bins = n_bins
        self.lo = lo
        self.hi = hi
        self.fold_every = fold_every

    def process_batch(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        if batch_df.isEmpty():
            return
        counts = histogram_counts(
            batch_df, self.value_col, self.by,
            n_bins=self.n_bins, lo=self.lo, hi=self.hi,
        )
        if batch_id is not None:
            last = self.lake.segment_meta(self.table).get("ingest_batch_id")
            if last is not None:
                if batch_id == last:
                    return  # at-least-once redelivery: already committed
                if batch_id < last:
                    raise ValueError(
                        f"stats batch id {batch_id} < last committed {last} "
                        f"for table {self.table!r}: these segments belong to "
                        "a different stream checkpoint (see the ingest "
                        "gate's contract)."
                    )
            self.lake.append_segment(
                self.table, counts, meta={"ingest_batch_id": batch_id}
            )
        else:
            self.lake.append_segment(self.table, counts)
        if (
            self.fold_every
            and batch_id is not None
            and (batch_id + 1) % self.fold_every == 0
        ):
            self.lake.fold_segments(self.table)

    def counts(self) -> DataFrame:
        """The accumulated (by, bin, cnt) table — raw segment rows; fold
        with a groupBy-sum (histogram_drift_from_counts does) or
        ``lake.fold_segments`` for storage."""
        return self.lake.table(self.table)

    def drift(self, smooth: float = 0.5) -> DataFrame:
        """(group, n, ks, psi) over EVERYTHING recorded so far, computed
        purely from persisted bin counts."""
        return histogram_drift_from_counts(
            self.counts(), self.by, n_bins=self.n_bins, smooth=smooth
        )

    def quantiles(
        self, probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95)
    ) -> DataFrame:
        """Per-group quantile estimates over everything recorded so far —
        bin-width-bounded error, zero document rescans."""
        return histogram_quantiles_from_counts(
            self.counts(), self.by, probs=probs,
            n_bins=self.n_bins, lo=self.lo, hi=self.hi,
        )
