"""Source URL parsing (reference A7b, /root/reference/src/s3.rs:52-63).

The reference accepts ``s3://bucket``, ``s3://bucket/`` and
``s3://bucket/prefix`` and splits into (bucket, path); anything else
falls through to the filesystem worker (src/main.rs:72-81).
"""

from __future__ import annotations

import re
import socket
from dataclasses import dataclass

_S3_URL = re.compile(r"^s3://(?P<bucket>[A-Za-z0-9\-_]+)(?:/(?P<path>.*))?$")


@dataclass(frozen=True)
class S3Location:
    bucket: str
    path: str  # prefix, '' for whole bucket

    @property
    def url(self) -> str:
        return f"s3://{self.bucket}/{self.path}" if self.path else f"s3://{self.bucket}"


def parse_s3_url(url: str) -> S3Location | None:
    """Parse an s3 URL; None if it is not one (-> fs fallback).

    Mirrors the reference's regex semantics (src/s3.rs:52-63, unit
    test src/s3.rs:159-175): trailing slash yields path ''.
    """
    m = _S3_URL.match(url)
    if m is None:
        return None
    return S3Location(bucket=m.group("bucket"), path=m.group("path") or "")


def default_fs_identifier(path: str) -> str:
    """``{hostname}:{path}`` (reference src/fs.rs:43-47)."""
    return f"{socket.gethostname()}:{path}"


def split_key(key: str) -> tuple[str, str]:
    """Object key -> (dir, filename) at the last '/'.

    Unlike the reference (which panics on keys without '/',
    src/s3.rs:107-108), a bare key yields dir ''.
    """
    if "/" in key:
        d, _, f = key.rpartition("/")
        return d, f
    return "", key
