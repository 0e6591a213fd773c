"""Real-Postgres test harness.

The container ships Postgres 15 binaries but no Python driver; the
cluster runs as the unprivileged postgres user (initdb refuses root)
on a unix socket under a world-traversable /tmp dir, and tests connect
through the package's driverless psql-pipe shim
(file_scraper_spark/sinks/psql_shim.py) — the same code path the CLI
falls back to for postgresql:// sinks without psycopg.
"""

from __future__ import annotations

import shutil
import subprocess
from pathlib import Path

from file_scraper_spark.sinks.psql_shim import (  # noqa: F401
    PsqlConnection,
    PsqlError,
)

pg_available = shutil.which("initdb") and shutil.which("pg_ctl")


class PgCluster:
    """Throwaway single-user cluster on a unix socket."""

    def __init__(self, base: Path, port: int = 54333):
        self.base = base
        self.port = port
        self.sock = base / "sock"
        self.data = base / "data"

    @property
    def dsn(self) -> str:
        return (
            f"postgresql://postgres@/postgres?host={self.sock}"
            f"&port={self.port}"
        )

    def _pg(self, *cmd: str) -> subprocess.CompletedProcess:
        # cwd="/": the postgres user cannot traverse into /root/repo
        return subprocess.run(
            ["runuser", "-u", "postgres", "--", *cmd],
            capture_output=True,
            text=True,
            cwd="/",
        )

    def start(self) -> None:
        self.base.mkdir(parents=True, exist_ok=True)
        self.sock.mkdir(exist_ok=True)
        self.base.chmod(0o755)
        subprocess.run(["chown", "-R", "postgres", str(self.base)], check=True)
        r = self._pg("initdb", "-D", str(self.data), "-A", "trust")
        assert r.returncode == 0, r.stderr
        r = self._pg(
            "pg_ctl", "-D", str(self.data), "-l", str(self.base / "log"),
            "-o",
            f"-k {self.sock} -p {self.port} -c listen_addresses=''",
            "start",
        )
        assert r.returncode == 0, r.stderr + r.stdout

    def connect(self) -> PsqlConnection:
        return PsqlConnection(self.dsn)

    def stop(self) -> None:
        self._pg("pg_ctl", "-D", str(self.data), "-m", "immediate", "stop")
