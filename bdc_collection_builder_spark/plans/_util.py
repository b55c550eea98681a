"""Shared helpers for plan modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bdc_collection_builder_spark.sources.tables import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# DuckDB-side normalization of events.ts, mirroring what load_table does
# on the Spark side (sources/tables.py): the driver-regenerated
# events.parquet may surface `ts` to the oracle as BIGINT epoch-nanos,
# TIMESTAMP, TIMESTAMP_NS, TIMESTAMP_NTZ, or TIMESTAMPTZ depending on
# writer vintage. The VARCHAR round-trip is the one expression that
# binds for every one of those types:
#   - BIGINT nanos  -> digits -> HUGEINT -> truncate to micros (same
#     truncation as Spark's `ts div 1000`) -> make_timestamp
#   - any timestamp -> text   -> TRY_CAST back to plain TIMESTAMP
#     (TIMESTAMP_NS text truncates to micros; TIMESTAMPTZ text carries
#     its offset, which the cast folds into UTC wall time)
DUCK_TS = (
    "COALESCE("
    "make_timestamp(CAST(TRY_CAST(CAST({c} AS VARCHAR) AS HUGEINT) // 1000"
    " AS BIGINT)), "
    "TRY_CAST(CAST({c} AS VARCHAR) AS TIMESTAMP))"
)


def duck_ts(col: str = "ts") -> str:
    """Type-robust DuckDB expression yielding ``col`` as plain UTC
    TIMESTAMP regardless of how the parquet surfaced it."""
    return DUCK_TS.format(c=col)


def scratch_dir(prefix: str) -> str:
    """``tempfile.mkdtemp`` with interpreter-exit reclamation.

    Every query/stage scratch (store roots, streaming checkpoints,
    staged parquet copies) must come through here: harness processes
    are transient and run hundreds of queries per round, so a bare
    mkdtemp accumulates table-sized litter in /tmp across rounds
    (ADVICE-r7 lo_dpp, ADVICE-r8 st_stream_static_enrich — this
    helper fixes the whole class). Cleanup is best-effort
    (``ignore_errors``): a scratch that outlives a crashed process is
    the OS tmpfiles reaper's job, exactly like before.
    """
    import atexit
    import shutil
    import tempfile

    path = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path
