"""Round-9 analytics verbs on the DataFlow API: time-series
continuous aggregates, robust stats, retrieval, linkage, JSON
shredding, and warehouse health checks — same thin-delegate pattern
as ops_scale.py (the operator modules stay canonical; verbs add the
journaled, dataset-in/dataset-out camelCase surface the reference's
users drive, betl/dataflow/DataFlowClass.py:4-46)."""

from __future__ import annotations

from pyspark.sql import DataFrame


class AnalyticsOps:
    def resampleGapfill(
        self,
        dataset: str,
        keyCol: str,
        tsMicrosCol: str,
        valueCol: str,
        bucketMicros: int = 86_400_000_000,
        targetDataset: str | None = None,
        desc: str = "",
    ) -> DataFrame:
        """Gap-filled per-key resample with forward-filled means
        (operators/timeseries.py:resample_gapfill)."""
        from betl_spark.operators import timeseries

        with self.journal.step("resampleGapfill", desc or f"resample {dataset}"):
            out = timeseries.resample_gapfill(
                self._get(dataset), keyCol, tsMicrosCol, valueCol, bucketMicros
            )
            self.data[targetDataset or f"{dataset}_resampled"] = out
        return out

    def rollingZscore(
        self,
        dataset: str,
        partCol: str,
        tsMicrosCol: str,
        tiebreakCol: str,
        valueCol: str,
        windowRows: int = 100,
        minRows: int = 20,
        zThresh: float = 3.0,
        targetDataset: str | None = None,
        desc: str = "",
    ) -> DataFrame:
        """Trailing-window anomaly scores
        (operators/timeseries.py:rolling_zscore)."""
        from betl_spark.operators import timeseries

        with self.journal.step("rollingZscore", desc or f"zscore {dataset}"):
            out = timeseries.rolling_zscore(
                self._get(dataset), partCol, tsMicrosCol, tiebreakCol,
                valueCol, window_rows=windowRows, min_rows=minRows,
                z_thresh=zThresh,
            )
            self.data[targetDataset or f"{dataset}_zscores"] = out
        return out

    def timeWeightedAvg(
        self,
        dataset: str,
        keyCol: str,
        tsMicrosCol: str,
        valueCol: str,
        targetDataset: str | None = None,
        desc: str = "",
    ) -> DataFrame:
        """Per-key TWAP (operators/timeseries.py:time_weighted_avg)."""
        from betl_spark.operators import timeseries

        with self.journal.step("timeWeightedAvg", desc or f"twap {dataset}"):
            out = timeseries.time_weighted_avg(
                self._get(dataset), keyCol, tsMicrosCol, valueCol
            )
            self.data[targetDataset or f"{dataset}_twap"] = out
        return out

    def rollingActives(
        self,
        dataset: str,
        tsMicrosCol: str,
        entityCol: str,
        windowBuckets: int = 7,
        bucketMicros: int = 86_400_000_000,
        targetDataset: str | None = None,
        desc: str = "",
    ) -> DataFrame:
        """Trailing-window distinct entities per bucket
        (operators/timeseries.py:rolling_distinct_count)."""
        from betl_spark.operators import timeseries

        with self.journal.step("rollingActives", desc or f"actives {dataset}"):
            out = timeseries.rolling_distinct_count(
                self._get(dataset), tsMicrosCol, entityCol,
                window_buckets=windowBuckets, bucket_micros=bucketMicros,
            )
            self.data[targetDataset or f"{dataset}_actives"] = out
        return out

    def searchBM25(
        self,
        dataset: str,
        idCol: str,
        textCol: str,
        terms: list[str],
        topN: int = 20,
        keepCols: list[str] | None = None,
        targetDataset: str | None = None,
        desc: str = "",
    ) -> DataFrame:
        """BM25-ranked retrieval (operators/corpus.py:bm25_topk)."""
        from betl_spark.operators import corpus

        with self.journal.step("searchBM25", desc or f"bm25 {dataset}"):
            out = corpus.bm25_topk(
                self._get(dataset), idCol, textCol, terms,
                top_n=topN, keep_cols=keepCols,
            )
            self.data[targetDataset or f"{dataset}_bm25"] = out
        return out

    def shredJson(
        self,
        dataset: str,
        jsonCol: str,
        fields: dict[str, str],
        keepCols: list[str] | None = None,
        targetDataset: str | None = None,
        desc: str = "",
    ) -> DataFrame:
        """Typed JSON field extraction with corrupt-record flags
        (operators/semistructured.py:shred_json)."""
        from betl_spark.operators import semistructured

        with self.journal.step("shredJson", desc or f"shred {dataset}"):
            out = semistructured.shred_json(
                self._get(dataset), jsonCol, fields, keep_cols=keepCols
            )
            self.data[targetDataset or f"{dataset}_shredded"] = out
        return out

    def fuzzyMatchNames(
        self,
        dataset: str,
        idCol: str,
        nameCol: str,
        maxDist: int = 3,
        targetDataset: str | None = None,
        desc: str = "",
    ) -> DataFrame:
        """Blocked fuzzy name linkage: canonicalize → first-token block
        → levenshtein (operators/linkage.py)."""
        from betl_spark.operators import linkage

        with self.journal.step("fuzzyMatchNames", desc or f"fuzzy {dataset}"):
            names = linkage.canonicalize_names(
                self._get(dataset), idCol, nameCol
            )
            out = linkage.fuzzy_join_blocked(
                names, linkage.first_token_block, max_dist=maxDist
            )
            self.data[targetDataset or f"{dataset}_name_pairs"] = out
        return out

    def integrityAudit(
        self,
        specs: list[tuple[str, str, list[str], str, list[str]]],
        targetDataset: str = "integrity_audit",
        desc: str = "",
    ) -> DataFrame:
        """FK orphan audit across loaded datasets: specs are
        (name, childDataset, childKeys, parentDataset, parentKeys)
        over THIS dataflow's datasets
        (operators/profile.py:referential_integrity)."""
        from betl_spark.operators import profile

        with self.journal.step("integrityAudit", desc or "fk audit"):
            resolved = [
                (name, self._get(c), ck, self._get(p), pk)
                for name, c, ck, p, pk in specs
            ]
            out = profile.referential_integrity(resolved)
            self.data[targetDataset] = out
        return out
