"""Bad-record quarantine — the engine's answer to the reference's error
policy (non-critical errors are logged and swallowed, jq runtime errors
silently yield nil, ``internal/pkg/jq/jq.go:85-87``; ``fail_on_error``
poisons the whole run, ``pipeline.go:240-250``).

Neither silent loss nor run-poisoning is acceptable for a CDC engine:
invalid change events are split off WITH their rejection reason into a
quarantine side-channel (badRecordsPath-style), while valid rows proceed.
The split is one pass of Column predicates — no Python, no second scan
(Catalyst computes both branches off the same cached predicate columns).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VALID_OPS = ("I", "U", "D", "UP")


@dataclass
class SplitResult:
    valid: DataFrame
    quarantined: DataFrame  # original columns + _reject_reason


def validate_change_events(events: DataFrame) -> SplitResult:
    """Split a change batch into (valid, quarantined).

    Rules (FIXTURES.md §2 contract):
    - lsn must be non-null and ≥ 0
    - op must be one of I/U/D/UP
    - (conv_id, turn_idx) must be non-null
    - non-delete events must carry text
    """
    # NULL op must be caught explicitly: under three-valued logic
    # ~isin(...) is NULL (not true) for NULL input, so a bare negation
    # would classify a null-op event as valid and the merge's
    # (op == 'D') tombstone predicate would silently swallow the row.
    reason = (
        F.when(F.col("lsn").isNull() | (F.col("lsn") < 0), "bad_lsn")
        .when(F.col("op").isNull() | ~F.col("op").isin(*VALID_OPS), "bad_op")
        .when(F.col("conv_id").isNull() | F.col("turn_idx").isNull(), "null_key")
        .when((F.col("op") != "D") & F.col("text").isNull(), "null_payload")
        .otherwise(None)
    )
    tagged = events.withColumn("_reject_reason", reason)
    return SplitResult(
        valid=tagged.filter(F.col("_reject_reason").isNull()).drop("_reject_reason"),
        quarantined=tagged.filter(F.col("_reject_reason").isNotNull()),
    )


def quarantine_to(events: DataFrame, path: str) -> DataFrame:
    """Validate; append rejects to the quarantine dir; return valid rows."""
    split = validate_change_events(events)
    split.quarantined.write.mode("append").parquet(path)
    return split.valid
