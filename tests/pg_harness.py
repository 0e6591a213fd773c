"""Real-Postgres test harness without a Python driver.

The container ships Postgres 15 binaries but no psycopg/pg8000, so
tests talk to a throwaway cluster through a minimal DB-API-ish shim
over a persistent ``psql`` pipe: statements stream to stdin, results
come back delimited, errors are detected from merged stderr, and
parameters are substituted with proper literal quoting (test-only; the
production path binds parameters through a real driver).

This is what lets the merge sink's Postgres dialect (three-valued row
predicate, ON CONFLICT semantics, temp tables, one-transaction scrape)
be verified against the actual engine the reference targets.
"""

from __future__ import annotations

import shutil
import subprocess
import uuid
from datetime import date, datetime
from pathlib import Path

SENTINEL = "__PSQL_DONE__"
NULL_TOKEN = "__PSQL_NULL__"
SEP = "\x1f"

pg_available = shutil.which("initdb") and shutil.which("pg_ctl")


class PgCluster:
    """Throwaway single-user cluster on a unix socket."""

    def __init__(self, base: Path, port: int = 54333):
        self.base = base
        self.port = port
        self.sock = base / "sock"
        self.data = base / "data"

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

    def stop(self) -> None:
        self._pg("pg_ctl", "-D", str(self.data), "-m", "immediate", "stop")


def quote_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, (datetime, date)):
        return f"'{v.isoformat()}'"
    s = str(v).replace("'", "''")
    return f"'{s}'"


class PsqlError(RuntimeError):
    pass


class PsqlConnection:
    """Just enough DB-API for MergeSink, over one psql session."""

    def __init__(self, cluster: PgCluster, dbname: str = "postgres"):
        self.proc = subprocess.Popen(
            [
                "runuser", "-u", "postgres", "--",
                "psql", "-h", str(cluster.sock), "-p", str(cluster.port),
                "-U", "postgres", "-d", dbname, "-X", "-A", "-t",
                "-F", SEP, "-v", "ON_ERROR_STOP=0", "-P", f"null={NULL_TOKEN}",
            ],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            bufsize=1,
            cwd="/",
        )
        self._last_rows: list[tuple] = []

    def _roundtrip(self, sql: str) -> list[str]:
        marker = f"{SENTINEL}_{uuid.uuid4().hex[:8]}"
        self.proc.stdin.write(sql.rstrip().rstrip(";") + ";\n")
        self.proc.stdin.write(f"\\echo {marker}\n")
        self.proc.stdin.flush()
        lines: list[str] = []
        while True:
            line = self.proc.stdout.readline()
            if not line:
                raise PsqlError("psql died")
            line = line.rstrip("\n")
            if line == marker:
                break
            lines.append(line)
        errors = [l for l in lines if l.startswith(("ERROR:", "FATAL:"))]
        if errors:
            raise PsqlError("; ".join(errors))
        return [
            l for l in lines
            if l and not l.startswith(
                ("NOTICE:", "WARNING:", "DETAIL:", "HINT:", "LINE ",
                 "INSERT ", "DELETE ", "UPDATE ", "CREATE", "DROP",
                 "BEGIN", "COMMIT", "ROLLBACK", "SET", "TRUNCATE", " ")
            )
        ]

    def execute(self, sql: str, params: tuple | None = None):
        if params:
            for p in params:
                sql = sql.replace("%s", quote_literal(p), 1).replace(
                    "?", quote_literal(p), 1
                )
        self._last_rows = [
            tuple(None if c == NULL_TOKEN else c for c in l.split(SEP))
            for l in self._roundtrip(sql)
        ]
        return self

    def executemany(self, sql: str, rows: list[tuple]) -> None:
        for r in rows:
            self.execute(sql, r)

    def fetchall(self) -> list[tuple]:
        return self._last_rows

    def fetchone(self):
        return self._last_rows[0] if self._last_rows else None

    def commit(self) -> None:
        self._roundtrip("COMMIT")

    def rollback(self) -> None:
        self._roundtrip("ROLLBACK")

    def close(self) -> None:
        try:
            self.proc.stdin.close()
            self.proc.wait(timeout=10)
        except Exception:
            self.proc.kill()
