"""Sinks: lake-table targets for the CDC MERGE path.

Pluggable like the reference's reader/writer maps
(``internal/pkg/pipeline/task/file/file.go:33-41``): the engine talks to
``TranscriptTable``; the default implementation is ``SnapshotTable``
(bucketed parquet + atomic snapshot log — works in any sandbox). On a real
cluster with the Iceberg runtime jar, ``iceberg_table.IcebergTable``
provides the same interface over ``MERGE INTO`` (import-gated, see
SURVEY.md §7.5 "No Iceberg jar in sandbox?").
"""

from caterpillar_spark.sinks.snapshot_table import SnapshotTable  # noqa: F401
