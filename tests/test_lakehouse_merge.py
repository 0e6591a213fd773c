"""Lakehouse MERGE INTO status (SURVEY §2.A A8 alternative, VERDICT
r5 carried ask #8).

Spark 4's parser and analyzer fully support ``MERGE INTO`` — the
blocker in this container is the CATALOG: row-level operations need a
DSv2 catalog implementing SupportsRowLevelOperations (Delta, Iceberg),
and the environment ships neither jar set nor network access to fetch
one; the built-in session catalog's parquet tables reject the
statement. These tests PIN that state:

- the statement must fail with exactly UNSUPPORTED_FEATURE.TABLE_
  OPERATION (i.e. syntax/analysis are fine, only the table capability
  is missing). If a lakehouse catalog ever appears in the image, the
  first test FAILS and flags that the real `MERGE INTO` variant can
  now be shipped (see SURVEY §4).
- the engine-side MERGE semantics are available TODAY, catalog-free:
  ``classify_merge`` + the soft-delete anti-join (the gate-checked
  scrape_merge_full query) compute exactly WHEN MATCHED AND
  tuple-changed THEN UPDATE / WHEN MATCHED ELSE no-op / WHEN NOT
  MATCHED THEN INSERT / WHEN NOT MATCHED BY SOURCE THEN soft-delete,
  verified here against a hand-computed merge on crafted frames.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.errors import UnsupportedOperationException
from pyspark.sql.utils import AnalysisException

from file_scraper_spark.operators.scrape import classify_merge


def test_merge_into_unsupported_by_session_catalog(spark, tmp_path):
    """MERGE INTO parses + analyzes, then fails ONLY on the table
    capability. A different error (or success) means the container
    gained row-level-operation support — revisit SURVEY §4.1."""
    spark.sql("DROP TABLE IF EXISTS lakehouse_merge_probe")
    spark.sql(
        "CREATE TABLE lakehouse_merge_probe (id INT, v STRING) "
        f"USING parquet LOCATION '{tmp_path}/lmp'"
    )
    try:
        with pytest.raises(Exception) as ei:
            spark.sql(
                "MERGE INTO lakehouse_merge_probe t "
                "USING (SELECT 1 AS id, 'a' AS v) s ON t.id = s.id "
                "WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *"
            )
        msg = str(ei.value)
        assert "MERGE INTO" in msg
        # NOT a parse/resolution error: the statement parses and
        # analyzes, then fails on exactly the table-capability
        # condition (pinned via the structured error class, not
        # substring-in-message — ADVICE r6: the old substring check
        # was tautological)
        assert isinstance(ei.value, UnsupportedOperationException), type(ei.value)
        assert not isinstance(ei.value, AnalysisException), type(ei.value)
        assert (
            ei.value.getCondition() == "UNSUPPORTED_FEATURE.TABLE_OPERATION"
        ), ei.value.getCondition()
    finally:
        spark.sql("DROP TABLE IF EXISTS lakehouse_merge_probe")


def test_dataframe_merge_matches_merge_into_semantics(spark):
    """The catalog-free merge path computes the same row actions a
    lakehouse MERGE INTO would: update only on tuple change (dead-
    write elimination, src/db.rs:115-117), insert on no match,
    no-op otherwise; soft delete = WHEN NOT MATCHED BY SOURCE."""
    existing = spark.createDataFrame(
        [
            (1, 10, "a", 1.0, None),   # unchanged -> noop
            (2, 20, "b", 2.0, None),   # value changes -> update
            (3, 30, "c", 3.0, None),   # absent from found -> delete
        ],
        "event_id long, user_id long, event_type string, value double, ts timestamp",
    )
    found = spark.createDataFrame(
        [
            (1, 10, "a", 1.0, None),
            (2, 20, "b", 2.5, None),
            (4, 40, "d", 4.0, None),   # new -> insert
        ],
        "event_id long, user_id long, event_type string, value double, ts timestamp",
    )
    actions = {
        r.event_id: r.action
        for r in classify_merge(existing, found).collect()
    }
    assert actions == {1: "noop", 2: "update", 4: "insert"}
    deleted = [
        r.event_id
        for r in existing.join(found, "event_id", "left_anti").collect()
    ]
    assert deleted == [3]
