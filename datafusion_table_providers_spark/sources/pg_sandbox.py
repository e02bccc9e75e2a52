"""Ephemeral local PostgreSQL server for live end-to-end validation.

The reference validates its Postgres provider against a real server in a
container (core/tests/docker/mod.rs); this module is that harness for this
environment: the PostgreSQL server binaries ship here (initdb / pg_ctl /
postgres), so instead of lint-only validation the generated dialect SQL,
type matrix, write path and connector scans run against an actual
PostgreSQL instance over a private unix socket with trust auth
(loopback-only by construction: ``listen_addresses=''`` — no TCP at all).

Root handling: PostgreSQL refuses to run as root. When the current
process is root (this container), every server command is wrapped in
``su <user> -s /bin/sh`` for the first available unprivileged account
(``postgres``, else ``nobody``) and the data/socket dirs are chown'd to
it. When already unprivileged, commands run directly.

Lifecycle is pg_ctl-managed (``-w`` waits for readiness; ``-m immediate``
teardown), one sandbox per base_dir so concurrent sandboxes never share
state. Client side is the in-repo pure-Python wire client
(sources/pgwire.py) — no external driver needed on driver or executors.
"""

from __future__ import annotations

import os
import pwd
import shutil
import subprocess
import uuid
from typing import List, Optional

#: fixed port — only names the socket file inside the sandbox-unique
#: socket dir (no TCP listener exists), so concurrent sandboxes never
#: collide on it.
PG_PORT = 55432

_BINDIRS = ("/usr/local/bin", "/usr/bin", "/usr/lib/postgresql/15/bin")


def _find_bin(name: str) -> Optional[str]:
    for d in _BINDIRS:
        p = os.path.join(d, name)
        if os.path.exists(p):
            return p
    return shutil.which(name)


def available() -> bool:
    """True when server binaries exist AND (if root) an unprivileged user
    is available to run them."""
    if not (_find_bin("initdb") and _find_bin("pg_ctl") and _find_bin("postgres")):
        return False
    if os.geteuid() == 0 and _sandbox_user() is None:
        return False
    return True


def _sandbox_user() -> Optional[str]:
    for name in ("postgres", "nobody"):
        try:
            pwd.getpwnam(name)
            return name
        except KeyError:
            continue
    return None


class PostgresSandbox:
    """One throwaway PostgreSQL cluster under ``base_dir``.

    >>> with PostgresSandbox() as pg:
    ...     con = pg.connect()
    ...     con.cursor().execute("SELECT 1")
    """

    def __init__(self, base_dir: Optional[str] = None):
        import tempfile

        self.base_dir = base_dir or os.path.join(
            tempfile.gettempdir(), f"pg_sandbox_{uuid.uuid4().hex[:10]}"
        )
        self.data_dir = os.path.join(self.base_dir, "data")
        self.sock_dir = os.path.join(self.base_dir, "sock")
        self.log_path = os.path.join(self.base_dir, "server.log")
        self.port = PG_PORT
        self.user = "postgres"  # database superuser created by initdb -U
        self._run_as = _sandbox_user() if os.geteuid() == 0 else None
        self._started = False

    # -- process plumbing --------------------------------------------------
    def _run(self, argv: List[str], **kw) -> subprocess.CompletedProcess:
        if self._run_as:
            cmd = " ".join(f"'{a}'" for a in argv)
            argv = ["su", self._run_as, "-s", "/bin/sh", "-c", cmd]
        return subprocess.run(
            argv, capture_output=True, text=True, timeout=120, **kw
        )

    def start(self) -> "PostgresSandbox":
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.sock_dir, exist_ok=True)
        if self._run_as:
            u = pwd.getpwnam(self._run_as)
            for d in (self.base_dir, self.data_dir, self.sock_dir):
                os.chown(d, u.pw_uid, u.pw_gid)
        r = self._run(
            [
                _find_bin("initdb"),
                "-D", self.data_dir,
                "-U", self.user,
                "-A", "trust",
                "--no-sync",
                "-E", "UTF8",
                "--locale=C",
            ]
        )
        if r.returncode != 0:
            raise RuntimeError(f"initdb failed: {r.stderr[-2000:]}")
        opts = (
            f"-k {self.sock_dir} -c listen_addresses= -p {self.port} -F "
            "-c shared_buffers=128MB -c synchronous_commit=off "
            "-c full_page_writes=off -c timezone=UTC"
        )
        r = self._run(
            [
                _find_bin("pg_ctl"),
                "-D", self.data_dir,
                "-o", opts,
                "-l", self.log_path,
                "-w",
                "start",
            ]
        )
        if r.returncode != 0:
            log = ""
            if os.path.exists(self.log_path):
                with open(self.log_path) as f:
                    log = f.read()[-2000:]
            raise RuntimeError(f"pg_ctl start failed: {r.stderr[-500:]} {log}")
        self._started = True
        return self

    def stop(self) -> None:
        if self._started:
            self._run(
                [
                    _find_bin("pg_ctl"),
                    "-D", self.data_dir,
                    "-m", "immediate",
                    "-w",
                    "stop",
                ]
            )
            self._started = False

    def destroy(self) -> None:
        self.stop()
        shutil.rmtree(self.base_dir, ignore_errors=True)

    def __enter__(self) -> "PostgresSandbox":
        return self.start()

    def __exit__(self, *_) -> None:
        self.destroy()

    # -- client wiring -----------------------------------------------------
    def connect(self, dbname: str = "postgres"):
        from datafusion_table_providers_spark.sources import pgwire

        return pgwire.connect(
            host=self.sock_dir, port=self.port, user=self.user, dbname=dbname
        )

    def dbapi_spec(self, dbname: str = "postgres"):
        """(module, connect_args, connect_kwargs) — the transport spec shape
        consumed by dbapi_reader_df / distributed_insert; serializable, so
        executor tasks open their own socket connections."""
        return (
            "datafusion_table_providers_spark.sources.pgwire",
            [],
            {
                "host": self.sock_dir,
                "port": self.port,
                "user": self.user,
                "dbname": dbname,
            },
        )

    def remote_backend(self, dbname: str = "postgres"):
        """A RemoteSqlBackend bound to this sandbox through the in-repo
        wire client (properties['transport']='dbapi' routes reader_df off
        JDBC; the module override points dbapi_spec at pgwire)."""
        from datafusion_table_providers_spark.sources.remote_sql import (
            RemoteSqlBackend,
        )

        backend = RemoteSqlBackend(
            kind="postgres",
            host=self.sock_dir,
            port=self.port,
            database=dbname,
            user=self.user,
            properties={"transport": "dbapi"},
        )
        spec = self.dbapi_spec(dbname)
        backend.dbapi_spec = lambda: spec  # sandbox socket, pgwire module
        return backend
