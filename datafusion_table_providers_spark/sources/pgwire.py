"""Minimal pure-Python PostgreSQL client (frontend/backend protocol v3).

Why this exists: the reference's Postgres provider executes its generated
dialect SQL on a real server (crates/postgres/src/lib.rs:202-321, pool at
crates/postgres/src/pool.rs); this repo's Postgres surface was previously
validated only by lint + DuckDB-executes-pg-clauses tests because no
Python Postgres driver ships in the environment. The server binary DOES
ship, so this module implements just enough of the public PostgreSQL
wire protocol (documented at postgresql.org/docs/current/protocol.html)
to execute statements over a local trust-auth socket:

- startup + trust/cleartext/md5 authentication,
- the simple query protocol (``execute`` without parameters),
- the extended query protocol — Parse/Bind/Describe/Execute/Sync — for
  parameterized statements (text-format parameters, server-side binding:
  no client-side literal splicing on the data path),
- text-format result decoding OID→Python (ints, floats, numeric, bool,
  text, bytea, date, time, timestamp[tz], uuid, json, 1-D arrays).

The surface is DB-API 2.0 (``connect``/``Connection``/``Cursor``,
``paramstyle = 'format'``) so the existing generic transports use it
unchanged: ``sources/dbapi_source.py`` scans via executor-side
connections and ``write/writer.py::distributed_insert`` writes through
per-partition connections, exactly as they already do for sqlite3/ADBC.

Scope notes (deliberate):
- No SSL/GSS and no SCRAM: the in-repo use is a loopback unix-socket
  sandbox (sources/pg_sandbox.py) with trust auth. md5/cleartext are
  handled because they are trivial; anything else raises clearly.
- COPY is out of scope; bulk ingest goes through the staged
  ``INSERT ... SELECT`` discipline like every other backend.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import os
import socket
import struct
from decimal import Decimal
from typing import Iterable, List, Optional, Sequence, Tuple

apilevel = "2.0"
threadsafety = 1
paramstyle = "format"


class Warning(Exception):  # noqa: A001 — DB-API mandated name
    pass


class Error(Exception):
    pass


class InterfaceError(Error):
    pass


class DatabaseError(Error):
    def __init__(self, fields: dict):
        self.severity = fields.get("S", "ERROR")
        self.sqlstate = fields.get("C", "")
        self.message = fields.get("M", "")
        self.detail = fields.get("D", "")
        super().__init__(
            f"{self.severity} {self.sqlstate}: {self.message}"
            + (f" ({self.detail})" if self.detail else "")
        )


class OperationalError(DatabaseError):
    pass


class ProgrammingError(DatabaseError):
    pass


class NotSupportedError(Error):
    pass


# ---------------------------------------------------------------------------
# text-format decoding, OID → Python (public catalog OIDs, pg_type.dat)
# ---------------------------------------------------------------------------

def _parse_date(s: str):
    if s in ("infinity", "-infinity"):
        return s
    return dt.date.fromisoformat(s)


def _parse_time(s: str) -> dt.time:
    return dt.time.fromisoformat(s)


def _parse_timestamp(s: str):
    if s in ("infinity", "-infinity"):
        return s
    return dt.datetime.fromisoformat(s.replace(" ", "T", 1))


def _parse_timestamptz(s: str):
    if s in ("infinity", "-infinity"):
        return s
    t = s.replace(" ", "T", 1)
    # short offsets like +00 / +05:30 parse natively on 3.11+
    return dt.datetime.fromisoformat(t)


def _parse_bytea(s: str) -> bytes:
    if s.startswith("\\x"):
        return bytes.fromhex(s[2:])
    # legacy escape format is never emitted by modern servers we start
    raise NotSupportedError("bytea escape format not supported")


def _parse_bool(s: str) -> bool:
    return s == "t"


_DECODERS = {
    16: _parse_bool,
    20: int,  # int8
    21: int,  # int2
    23: int,  # int4
    26: int,  # oid
    28: int,  # xid
    700: float,  # float4
    701: float,  # float8
    1700: Decimal,  # numeric
    17: _parse_bytea,
    1082: _parse_date,
    1083: _parse_time,
    1114: _parse_timestamp,
    1184: _parse_timestamptz,
}

#: array OID → element OID for the 1-D arrays the type matrix covers
_ARRAY_ELEM = {
    1000: 16,
    1005: 21,
    1007: 23,
    1016: 20,
    1021: 700,
    1022: 701,
    1231: 1700,
    1009: 25,
    1015: 1043,
    1014: 1042,
    1182: 1082,
    1115: 1114,
    1185: 1184,
    1001: 17,
}


def _parse_array(s: str, elem_oid: int):
    """Parse a text-format array literal (possibly nested) into lists."""
    decode = _DECODERS.get(elem_oid, lambda x: x)
    pos = 0

    def parse_value():
        nonlocal pos
        if s[pos] == "{":
            pos += 1
            out = []
            if s[pos] == "}":
                pos += 1
                return out
            while True:
                out.append(parse_value())
                if s[pos] == ",":
                    pos += 1
                    continue
                if s[pos] == "}":
                    pos += 1
                    return out
                raise InterfaceError(f"bad array literal at {pos}: {s!r}")
        if s[pos] == '"':
            pos += 1
            buf = []
            while True:
                c = s[pos]
                if c == "\\":
                    buf.append(s[pos + 1])
                    pos += 2
                    continue
                if c == '"':
                    pos += 1
                    break
                buf.append(c)
                pos += 1
            return decode("".join(buf))
        start = pos
        while s[pos] not in ",}":
            pos += 1
        raw = s[start:pos]
        if raw == "NULL":
            return None
        return decode(raw)

    # a leading dimension spec like [0:2]= may prefix the braces
    if s.startswith("["):
        pos = s.index("=") + 1
    return parse_value()


def _decode(oid: int, raw: bytes):
    s = raw.decode("utf-8")
    if oid in _ARRAY_ELEM:
        return _parse_array(s, _ARRAY_ELEM[oid])
    dec = _DECODERS.get(oid)
    return dec(s) if dec else s


# ---------------------------------------------------------------------------
# parameter encoding, Python → text format
# ---------------------------------------------------------------------------

def _encode_array(v) -> str:
    parts = []
    for e in v:
        if e is None:
            parts.append("NULL")
        elif isinstance(e, (list, tuple)):
            parts.append(_encode_array(e))
        else:
            t = _encode_param(e)
            t = t.replace("\\", "\\\\").replace('"', '\\"')
            parts.append(f'"{t}"')
    return "{" + ",".join(parts) + "}"


def _encode_param(v) -> Optional[str]:
    if v is None:
        return None
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, (int, float, Decimal)):
        return str(v)
    if isinstance(v, str):
        return v
    if isinstance(v, (bytes, bytearray, memoryview)):
        return "\\x" + bytes(v).hex()
    if isinstance(v, dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, (dt.date, dt.time)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return _encode_array(v)
    raise InterfaceError(f"cannot encode parameter of type {type(v).__name__}")


def _numbered_placeholders(sql: str) -> str:
    """``%s`` → ``$1..$n`` / ``%%`` → ``%``, skipping string literals and
    quoted identifiers (our generated DML never puts markers inside
    literals, but user-supplied fragments may legitimately contain ``%``)."""
    out = []
    i, n, k = 0, len(sql), 0
    while i < n:
        c = sql[i]
        if c in ("'", '"'):
            quote = c
            out.append(c)
            i += 1
            while i < n:
                out.append(sql[i])
                if sql[i] == quote:
                    if i + 1 < n and sql[i + 1] == quote:
                        out.append(quote)
                        i += 2
                        continue
                    i += 1
                    break
                i += 1
            continue
        if c == "%" and i + 1 < n:
            if sql[i + 1] == "s":
                k += 1
                out.append(f"${k}")
                i += 2
                continue
            if sql[i + 1] == "%":
                out.append("%")
                i += 2
                continue
        out.append(c)
        i += 1
    return "".join(out)


# ---------------------------------------------------------------------------
# wire plumbing
# ---------------------------------------------------------------------------

_INT32 = struct.Struct("!i")
_INT16 = struct.Struct("!h")


class _Wire:
    def __init__(self, sock: socket.socket):
        self.sock = sock
        self._buf = b""

    def _recv_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise InterfaceError("server closed the connection")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def read_message(self) -> Tuple[bytes, bytes]:
        head = self._recv_exact(5)
        mtype = head[:1]
        (length,) = _INT32.unpack(head[1:5])
        return mtype, self._recv_exact(length - 4)

    def send(self, mtype: bytes, payload: bytes = b"") -> None:
        self.sock.sendall(mtype + _INT32.pack(len(payload) + 4) + payload)

    def send_startup(self, params: dict) -> None:
        body = _INT32.pack(196608)  # protocol 3.0
        for k, v in params.items():
            body += k.encode() + b"\0" + v.encode() + b"\0"
        body += b"\0"
        self.sock.sendall(_INT32.pack(len(body) + 4) + body)


def _cstring(data: bytes, pos: int) -> Tuple[str, int]:
    end = data.index(b"\0", pos)
    return data[pos:end].decode("utf-8"), end + 1


def _error_fields(payload: bytes) -> dict:
    fields, pos = {}, 0
    while pos < len(payload) and payload[pos] != 0:
        code = chr(payload[pos])
        val, pos = _cstring(payload, pos + 1)
        fields[code] = val
    return fields


class Connection:
    def __init__(
        self,
        host: str = "/tmp",
        port: int = 5432,
        user: str = "postgres",
        dbname: str = "postgres",
        password: Optional[str] = None,
        connect_timeout: float = 10.0,
        options: Optional[dict] = None,
    ):
        self.notices: List[dict] = []
        self.parameters: dict = {}
        self._begun = False
        self.autocommit = False
        self.closed = False
        if host.startswith("/"):
            sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            sock.settimeout(connect_timeout)
            sock.connect(os.path.join(host, f".s.PGSQL.{port}"))
        else:
            sock = socket.create_connection((host, port), connect_timeout)
        sock.settimeout(None)
        self._wire = _Wire(sock)
        startup = {"user": user, "database": dbname}
        startup.update(options or {})
        self._wire.send_startup(startup)
        self._authenticate(user, password)

    def _authenticate(self, user: str, password: Optional[str]) -> None:
        while True:
            mtype, payload = self._wire.read_message()
            if mtype == b"R":
                (code,) = _INT32.unpack(payload[:4])
                if code == 0:  # AuthenticationOk
                    continue
                if code == 3:  # cleartext
                    if password is None:
                        raise OperationalError({"M": "password required"})
                    self._wire.send(b"p", password.encode() + b"\0")
                    continue
                if code == 5:  # md5
                    if password is None:
                        raise OperationalError({"M": "password required"})
                    salt = payload[4:8]
                    inner = hashlib.md5(
                        password.encode() + user.encode()
                    ).hexdigest()
                    digest = hashlib.md5(inner.encode() + salt).hexdigest()
                    self._wire.send(b"p", b"md5" + digest.encode() + b"\0")
                    continue
                raise NotSupportedError(
                    f"authentication method {code} not supported (use trust/"
                    "password/md5)"
                )
            elif mtype == b"S":
                k, pos = _cstring(payload, 0)
                v, _ = _cstring(payload, pos)
                self.parameters[k] = v
            elif mtype == b"K":
                self._backend_key = struct.unpack("!ii", payload)
            elif mtype == b"Z":
                return
            elif mtype == b"E":
                raise OperationalError(_error_fields(payload))
            elif mtype == b"N":
                self.notices.append(_error_fields(payload))
            else:
                raise InterfaceError(f"unexpected message {mtype!r} in startup")

    # -- DB-API surface ---------------------------------------------------
    def cursor(self) -> "Cursor":
        if self.closed:
            raise InterfaceError("connection is closed")
        return Cursor(self)

    def commit(self) -> None:
        if self._begun:
            self._simple("COMMIT")
            self._begun = False

    def rollback(self) -> None:
        if self._begun:
            self._simple("ROLLBACK")
            self._begun = False

    def close(self) -> None:
        if not self.closed:
            try:
                self._wire.send(b"X")
                self._wire.sock.close()
            finally:
                self.closed = True

    def __enter__(self):
        return self

    def __exit__(self, exc_type, *_):
        if exc_type is None:
            self.commit()
        else:
            self.rollback()
        self.close()

    # -- protocol drivers -------------------------------------------------
    def _ensure_tx(self, sql: str) -> None:
        if self.autocommit or self._begun:
            return
        head = sql.lstrip()[:6].upper()
        if head.startswith(("BEGIN", "COMMIT", "ROLLBA")):
            return
        self._simple("BEGIN")
        self._begun = True

    def _simple(self, sql: str):
        """Simple query protocol: returns (description, rows, rowcount) of
        the LAST result set in the (possibly multi-statement) string."""
        self._wire.send(b"Q", sql.encode("utf-8") + b"\0")
        return self._collect(expect_ready=True)

    def _extended(self, sql: str, params: Sequence):
        """One Parse/Bind/Describe/Execute/Sync round trip, text format."""
        w = self._wire
        q = _numbered_placeholders(sql).encode("utf-8")
        w.send(b"P", b"\0" + q + b"\0" + _INT16.pack(0))
        w.send(b"B", self._bind_payload(params))
        w.send(b"D", b"P\0")
        w.send(b"E", b"\0" + _INT32.pack(0))
        w.send(b"S")
        return self._collect(expect_ready=True)

    @staticmethod
    def _bind_payload(params: Sequence) -> bytes:
        body = b"\0\0"  # unnamed portal, unnamed statement
        body += _INT16.pack(0)  # all params text format
        body += _INT16.pack(len(params))
        for p in params:
            text = _encode_param(p)
            if text is None:
                body += _INT32.pack(-1)
            else:
                raw = text.encode("utf-8")
                body += _INT32.pack(len(raw)) + raw
        body += _INT16.pack(1) + _INT16.pack(0)  # all results text format
        return body

    def _collect(self, expect_ready: bool):
        description = None
        rows: List[tuple] = []
        rowcount = -1
        error: Optional[dict] = None
        while True:
            mtype, payload = self._wire.read_message()
            if mtype == b"T":
                (nfields,) = _INT16.unpack(payload[:2])
                pos = 2
                description = []
                for _ in range(nfields):
                    name, pos = _cstring(payload, pos)
                    _table, _col, oid, _len, _mod, _fmt = struct.unpack(
                        "!ihihih", payload[pos : pos + 18]
                    )
                    pos += 18
                    description.append((name, oid, None, None, None, None, None))
                rows = []
            elif mtype == b"D":
                (nfields,) = _INT16.unpack(payload[:2])
                pos = 2
                vals = []
                for i in range(nfields):
                    (vlen,) = _INT32.unpack(payload[pos : pos + 4])
                    pos += 4
                    if vlen == -1:
                        vals.append(None)
                    else:
                        raw = payload[pos : pos + vlen]
                        pos += vlen
                        vals.append(_decode(description[i][1], raw))
                rows.append(tuple(vals))
            elif mtype == b"C":
                tag, _ = _cstring(payload, 0)
                parts = tag.split()
                if parts and parts[-1].isdigit():
                    rowcount = int(parts[-1])
            elif mtype in (b"1", b"2", b"n", b"s", b"I"):
                pass  # ParseComplete / BindComplete / NoData / suspended / empty
            elif mtype == b"E":
                error = _error_fields(payload)
            elif mtype == b"N":
                self.notices.append(_error_fields(payload))
            elif mtype == b"S":
                k, pos = _cstring(payload, 0)
                v, _ = _cstring(payload, pos)
                self.parameters[k] = v
            elif mtype == b"Z":
                if error is not None:
                    # an open implicit tx is now aborted server-side
                    cls = (
                        ProgrammingError
                        if error.get("C", "").startswith(("42", "22"))
                        else OperationalError
                    )
                    raise cls(error)
                if expect_ready:
                    return description, rows, rowcount
            elif mtype in (b"G", b"H", b"W", b"d", b"c"):
                raise NotSupportedError("COPY protocol not supported")
            else:
                raise InterfaceError(f"unexpected message {mtype!r}")


class Cursor:
    arraysize = 1

    def __init__(self, con: Connection):
        self.connection = con
        self.description = None
        self.rowcount = -1
        self._rows: List[tuple] = []
        self._pos = 0

    def execute(self, sql: str, params: Optional[Iterable] = None) -> "Cursor":
        con = self.connection
        con._ensure_tx(sql)
        if params is None:
            desc, rows, rc = con._simple(sql)
        else:
            desc, rows, rc = con._extended(sql, list(params))
        self.description = desc
        self._rows = rows
        self._pos = 0
        self.rowcount = rc if rc >= 0 else (len(rows) if desc else -1)
        return self

    def executemany(self, sql: str, seq_of_params) -> "Cursor":
        total = 0
        for params in seq_of_params:
            self.execute(sql, params)
            if self.rowcount > 0:
                total += self.rowcount
        self.rowcount = total
        self.description = None
        self._rows = []
        return self

    def fetchone(self):
        if self._pos >= len(self._rows):
            return None
        row = self._rows[self._pos]
        self._pos += 1
        return row

    def fetchmany(self, size: Optional[int] = None):
        size = size or self.arraysize
        out = self._rows[self._pos : self._pos + size]
        self._pos += len(out)
        return out

    def fetchall(self):
        out = self._rows[self._pos :]
        self._pos = len(self._rows)
        return out

    def __iter__(self):
        while True:
            row = self.fetchone()
            if row is None:
                return
            yield row

    def close(self) -> None:
        self._rows = []


def connect(
    dsn: Optional[str] = None,
    host: str = "/tmp",
    port: int = 5432,
    user: str = "postgres",
    dbname: str = "postgres",
    password: Optional[str] = None,
    **kwargs,
) -> Connection:
    """``dsn`` accepts the libpq keyword form ``host=... port=... dbname=...
    user=...`` (what RemoteSqlBackend.dbapi_spec emits for psycopg)."""
    if dsn:
        for part in dsn.split():
            k, _, v = part.partition("=")
            if k == "host":
                host = v
            elif k == "port":
                port = int(v)
            elif k in ("dbname", "database"):
                dbname = v
            elif k == "user":
                user = v
            elif k == "password":
                password = v
    return Connection(
        host=host, port=port, user=user, dbname=dbname, password=password, **kwargs
    )
