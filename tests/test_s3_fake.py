"""End-to-end S3 fallback path against a fake boto3-shaped client:
ListObjectsV2 pagination across >1 page, the created-NULL quirk
(src/s3.rs:123), the missing-IsTruncated error path (src/s3.rs:145),
and the full scrape -> merge -> soft-delete flow. The fake keeps the
error-injection cases (omitted IsTruncated) a real server won't
serve; the REAL-endpoint twin lives in test_s3_moto.py."""

from __future__ import annotations

from datetime import datetime, timezone

import duckdb
import pytest

from file_scraper_spark.sinks.merge_sink import MergeSink
from file_scraper_spark.sources.s3 import list_objects_boto3, scrape_s3
from file_scraper_spark.sources.url import parse_s3_url

N_KEYS = 2500
T_MOD = datetime(2024, 3, 1, 8, 30, 0, tzinfo=timezone.utc)


class FakeS3Client:
    """Minimal boto3.client('s3') stand-in: serves `keys` in
    MaxKeys-sized pages with real continuation-token bookkeeping and
    records every request for pagination assertions."""

    def __init__(self, keys, omit_is_truncated: bool = False):
        self.keys = sorted(keys)
        self.omit_is_truncated = omit_is_truncated
        self.requests: list[dict] = []

    def list_objects_v2(self, **kwargs):
        self.requests.append(kwargs)
        prefix = kwargs.get("Prefix", "")
        page_size = kwargs.get("MaxKeys", 1000)
        matching = [k for k in self.keys if k.startswith(prefix)]
        start = int(kwargs.get("ContinuationToken", "0"))
        page = matching[start : start + page_size]
        resp = {
            "Contents": [
                {"Key": k, "LastModified": T_MOD, "Size": 100 + len(k)}
                for k in page
            ]
        }
        if self.omit_is_truncated:
            return resp
        truncated = start + page_size < len(matching)
        resp["IsTruncated"] = truncated
        if truncated:
            resp["NextContinuationToken"] = str(start + page_size)
        return resp


def _keys(n=N_KEYS):
    return [f"data/part={i % 10}/file_{i:05d}.parquet" for i in range(n)]


def test_pagination_lists_all_pages(spark):
    client = FakeS3Client(_keys())
    loc = parse_s3_url("s3://bkt/data")
    listed = list_objects_boto3(spark, loc, client=client)
    rows = listed.collect()
    assert len(rows) == N_KEYS
    # 3 requests for 2500 keys at MaxKeys=1000, tokens threaded through
    assert len(client.requests) == 3
    assert "ContinuationToken" not in client.requests[0]
    assert client.requests[1]["ContinuationToken"] == "1000"
    assert client.requests[2]["ContinuationToken"] == "2000"
    assert all(r["Prefix"] == "data" for r in client.requests)


def test_missing_is_truncated_errors(spark):
    """Reference parity (src/s3.rs:145): a response without the
    IsTruncated flag must error, not silently stop paging — stopping
    early would soft-delete every unseen object downstream."""
    client = FakeS3Client(_keys(50), omit_is_truncated=True)
    with pytest.raises(ValueError, match="IsTruncated"):
        list_objects_boto3(spark, parse_s3_url("s3://bkt/data"), client=client)


def test_scrape_s3_projection_quirks(spark):
    """created always NULL (src/s3.rs:123); keys without '/' get path
    '' instead of the reference's panic (src/s3.rs:107-108); mime from
    extension."""
    client = FakeS3Client(["data/a.csv", "rootfile.txt"])
    df = scrape_s3(
        spark, parse_s3_url("s3://bkt"), use_s3a=False, client=client
    )
    rows = {r.filename: r for r in df.collect()}
    assert set(rows) == {"a.csv", "rootfile.txt"}
    assert all(r.created is None for r in rows.values())
    assert rows["a.csv"].path == "data"
    assert rows["rootfile.txt"].path == ""  # no-slash key, no crash
    assert rows["a.csv"].mime_type == "text/csv"
    assert rows["rootfile.txt"].mime_type == "text/plain"
    assert rows["a.csv"].external_source == "s3://bkt"


def test_s3_scrape_merge_soft_delete_e2e(spark, tmp_path):
    """The full fallback pipeline at paginated scale: 2500-key listing
    -> FileInfo projection -> transactional merge; a rescrape with a
    vanished prefix soft-deletes exactly that tail."""
    path = str(tmp_path / "s3sink.duckdb")

    def connect():
        return duckdb.connect(path)

    sink = MergeSink(connect)
    sink.ensure_target()
    loc = parse_s3_url("s3://bkt/data")
    t1 = datetime(2024, 3, 2, 0, 0, 0)
    t2 = datetime(2024, 3, 3, 0, 0, 0)

    found1 = scrape_s3(spark, loc, use_s3a=False, client=FakeS3Client(_keys()))
    sink.sync_snapshot(found1, loc.url, t1)
    con = connect()
    assert con.execute("SELECT COUNT(*) FROM external_file").fetchone()[0] == N_KEYS
    assert (
        con.execute(
            "SELECT COUNT(*) FROM external_file WHERE deleted IS NOT NULL"
        ).fetchone()[0]
        == 0
    )
    con.close()

    # second scrape: partition 7 vanished (250 keys)
    keys2 = [k for k in _keys() if "part=7" not in k]
    found2 = scrape_s3(spark, loc, use_s3a=False, client=FakeS3Client(keys2))
    sink.sync_snapshot(found2, loc.url, t2)
    con = connect()
    gone = con.execute(
        "SELECT COUNT(*) FROM external_file WHERE deleted IS NOT NULL"
    ).fetchone()[0]
    live = con.execute(
        "SELECT COUNT(*) FROM external_file WHERE deleted IS NULL"
    ).fetchone()[0]
    assert gone == N_KEYS // 10
    assert live == N_KEYS - N_KEYS // 10
    # created stayed NULL through the sink round-trip
    assert (
        con.execute(
            "SELECT COUNT(*) FROM external_file WHERE created IS NOT NULL"
        ).fetchone()[0]
        == 0
    )
    con.close()
