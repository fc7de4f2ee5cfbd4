"""CQL native protocol v4 + statement prep — pure-stdlib Cassandra path.

Spark analog of the transport/statement layer under the reference's
Cassandra sink (`model/sink/CassandraSinkConfig.scala:28-80` — host,
port 9042, a ``query`` INSERT with ``?`` placeholders bound
positionally per record; `model/CassandraClusterBuilder.scala`). The
reference rides the DataStax driver inside the Flink connector jar; no
client library ships here, so the published CQL binary protocol v4
spec (frame header, STARTUP/QUERY/RESULT opcodes, PLAIN auth) is
implemented directly on sockets — the ``util/aws_signer`` pattern.

Statement prep (literal rendering, ?-binding, CREATE TABLE from a
Spark schema) and frame construction are deterministic and unit-tested
against hand-computed byte vectors; only :class:`CqlClient` touches
the network, gated by the sink on a configured ``host``.
"""

from __future__ import annotations

import socket
import struct
from dataclasses import dataclass

from pyspark.sql import types as T

# -- protocol constants (native_protocol_v4.spec) ----------------------------

VERSION_REQUEST = 0x04
VERSION_RESPONSE = 0x84

OP_ERROR = 0x00
OP_STARTUP = 0x01
OP_READY = 0x02
OP_AUTHENTICATE = 0x03
OP_OPTIONS = 0x05
OP_SUPPORTED = 0x06
OP_QUERY = 0x07
OP_RESULT = 0x08
OP_AUTH_RESPONSE = 0x0F
OP_AUTH_SUCCESS = 0x10

RESULT_VOID = 0x0001
RESULT_ROWS = 0x0002
RESULT_SET_KEYSPACE = 0x0003
RESULT_SCHEMA_CHANGE = 0x0005

CONSISTENCY = {
    "ANY": 0x0000,
    "ONE": 0x0001,
    "TWO": 0x0002,
    "THREE": 0x0003,
    "QUORUM": 0x0004,
    "ALL": 0x0005,
    "LOCAL_QUORUM": 0x0006,
    "EACH_QUORUM": 0x0007,
    "LOCAL_ONE": 0x000A,
}

# option ids for column types in RESULT Rows metadata
TYPE_ASCII = 0x0001
TYPE_BIGINT = 0x0002
TYPE_BLOB = 0x0003
TYPE_BOOLEAN = 0x0004
TYPE_DOUBLE = 0x0007
TYPE_FLOAT = 0x0008
TYPE_INT = 0x0009
TYPE_TIMESTAMP = 0x000B
TYPE_VARCHAR = 0x000D
TYPE_SMALLINT = 0x0013
TYPE_DATE = 0x0011


# -- primitive encodings -----------------------------------------------------


def cql_string(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack(">H", len(b)) + b


def cql_long_string(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack(">i", len(b)) + b


def cql_string_map(d: dict) -> bytes:
    out = struct.pack(">H", len(d))
    for k, v in d.items():
        out += cql_string(k) + cql_string(v)
    return out


def cql_bytes(b: bytes | None) -> bytes:
    if b is None:
        return struct.pack(">i", -1)
    return struct.pack(">i", len(b)) + b


def cql_frame(opcode: int, body: bytes, stream: int = 0) -> bytes:
    """v4 request frame: version, flags, stream (2B signed), opcode,
    length, body."""
    return (
        struct.pack(">BBhBI", VERSION_REQUEST, 0, stream, opcode, len(body))
        + body
    )


def startup_frame(stream: int = 0) -> bytes:
    return cql_frame(
        OP_STARTUP, cql_string_map({"CQL_VERSION": "3.0.0"}), stream
    )


def auth_response_frame(user: str, password: str, stream: int = 0) -> bytes:
    token = b"\x00" + user.encode() + b"\x00" + password.encode()
    return cql_frame(OP_AUTH_RESPONSE, cql_bytes(token), stream)


def query_frame(
    query: str, consistency: str = "LOCAL_ONE", stream: int = 0
) -> bytes:
    """QUERY with no bound values (statements arrive fully rendered):
    <long string><consistency><flags=0>."""
    body = (
        cql_long_string(query)
        + struct.pack(">H", CONSISTENCY[consistency.upper()])
        + b"\x00"
    )
    return cql_frame(OP_QUERY, body, stream)


def parse_frame_header(buf: bytes) -> tuple[int, int, int]:
    """-> (stream, opcode, body length). Validates the response version."""
    version, _flags, stream, opcode, length = struct.unpack_from(
        ">BBhBI", buf, 0
    )
    if version != VERSION_RESPONSE:
        raise ValueError(f"unexpected response version 0x{version:02x}")
    return stream, opcode, length


# -- statement prep ----------------------------------------------------------


def cql_literal(v) -> str:
    """Render one Python value as a CQL literal. Strings escape single
    quotes by doubling (CQL grammar); bytes render as 0x blobs; floats
    via repr (shortest round-trip)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int,)):
        return str(v)
    if isinstance(v, float):
        # CQL's non-finite spellings — repr() would emit 'inf'/'nan',
        # which no CQL parser accepts
        if v != v:
            return "NaN"
        if v == float("inf"):
            return "Infinity"
        if v == float("-inf"):
            return "-Infinity"
        return repr(v)
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    s = str(v)
    return "'" + s.replace("'", "''") + "'"


def bind(query: str, values: list | tuple) -> str:
    """Substitute positional ``?`` placeholders with rendered literals —
    the reference's per-record bind (`CassandraSinkConfig.scala:41-47`
    setQuery + positional extract). Placeholders inside string literals
    of the template are not supported (none are generated by
    :func:`insert_statement`)."""
    parts = query.split("?")
    if len(parts) - 1 != len(values):
        raise ValueError(
            f"query has {len(parts) - 1} placeholders, got "
            f"{len(values)} values"
        )
    out = [parts[0]]
    for seg, v in zip(parts[1:], values):
        out.append(cql_literal(v))
        out.append(seg)
    return "".join(out)


def quote_ident(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


def insert_statement(
    table: str, columns: list[str], keyspace: str | None = None
) -> str:
    """INSERT with ``?`` placeholders — what the reference's ``query``
    config holds; generated here from the frame schema when the user
    doesn't supply one."""
    target = (
        f"{quote_ident(keyspace)}.{quote_ident(table)}"
        if keyspace
        else quote_ident(table)
    )
    return (
        f"INSERT INTO {target} ("
        + ", ".join(quote_ident(c) for c in columns)
        + ") VALUES ("
        + ", ".join("?" for _ in columns)
        + ")"
    )


_SPARK_TO_CQL = {
    T.LongType(): "bigint",
    T.IntegerType(): "int",
    T.ShortType(): "smallint",
    T.DoubleType(): "double",
    T.FloatType(): "float",
    T.StringType(): "text",
    T.BooleanType(): "boolean",
    T.DateType(): "date",
    T.TimestampType(): "timestamp",
    T.BinaryType(): "blob",
}


def cql_type(dt: T.DataType) -> str:
    if isinstance(dt, T.DecimalType):
        return "decimal"
    out = _SPARK_TO_CQL.get(dt)
    if out is None:
        raise ValueError(f"no CQL mapping for Spark type {dt}")
    return out


def create_table_cql(
    table: str,
    schema: T.StructType,
    pk: list[str] | str,
    keyspace: str | None = None,
) -> str:
    """CREATE TABLE IF NOT EXISTS from a Spark schema — Cassandra
    requires a primary key; the first pk column is the partition key."""
    pk = [pk] if isinstance(pk, str) else list(pk)
    if not pk:
        raise ValueError("cassandra tables require a primary key")
    target = (
        f"{quote_ident(keyspace)}.{quote_ident(table)}"
        if keyspace
        else quote_ident(table)
    )
    cols = [
        f"{quote_ident(f.name)} {cql_type(f.dataType)}"
        for f in schema.fields
    ]
    cols.append(
        "PRIMARY KEY (" + ", ".join(quote_ident(c) for c in pk) + ")"
    )
    return (
        f"CREATE TABLE IF NOT EXISTS {target} (\n  "
        + ",\n  ".join(cols)
        + "\n)"
    )


def create_keyspace_cql(keyspace: str, replication: int = 1) -> str:
    return (
        f"CREATE KEYSPACE IF NOT EXISTS {quote_ident(keyspace)} WITH "
        "replication = {'class': 'SimpleStrategy', "
        f"'replication_factor': {replication}}}"
    )


# -- result parsing ----------------------------------------------------------


@dataclass
class Rows:
    columns: list[str]
    types: list[int]
    rows: list[tuple]


def _read_string(buf: bytes, off: int) -> tuple[str, int]:
    (n,) = struct.unpack_from(">H", buf, off)
    return buf[off + 2 : off + 2 + n].decode("utf-8"), off + 2 + n


def _decode_value(type_id: int, b: bytes | None):
    if b is None:
        return None
    if type_id in (TYPE_VARCHAR, TYPE_ASCII):
        return b.decode("utf-8")
    if type_id == TYPE_BIGINT or type_id == TYPE_TIMESTAMP:
        return struct.unpack(">q", b)[0]
    if type_id == TYPE_INT:
        return struct.unpack(">i", b)[0]
    if type_id == TYPE_SMALLINT:
        return struct.unpack(">h", b)[0]
    if type_id == TYPE_DOUBLE:
        return struct.unpack(">d", b)[0]
    if type_id == TYPE_FLOAT:
        return struct.unpack(">f", b)[0]
    if type_id == TYPE_BOOLEAN:
        return b != b"\x00"
    if type_id == TYPE_DATE:
        # unsigned days with epoch at 2^31
        return struct.unpack(">I", b)[0] - 2**31
    return b  # blob / unmapped: raw bytes


def parse_result(body: bytes):
    """RESULT body → None (void / set-keyspace / schema-change) or
    :class:`Rows`."""
    (kind,) = struct.unpack_from(">i", body, 0)
    off = 4
    if kind != RESULT_ROWS:
        return None
    flags, col_count = struct.unpack_from(">iI", body, off)
    off += 8
    global_spec = flags & 0x0001
    has_more = flags & 0x0002
    no_metadata = flags & 0x0004
    if has_more:
        (n,) = struct.unpack_from(">i", body, off)
        off += 4 + max(0, n)
    if no_metadata:
        raise ValueError("NO_METADATA result not supported")
    if global_spec:
        _, off = _read_string(body, off)  # keyspace
        _, off = _read_string(body, off)  # table
    names: list[str] = []
    types: list[int] = []
    for _ in range(col_count):
        if not global_spec:
            _, off = _read_string(body, off)
            _, off = _read_string(body, off)
        name, off = _read_string(body, off)
        (tid,) = struct.unpack_from(">H", body, off)
        off += 2
        # parametrized types carry extra option payload; only decode the
        # scalar set the sink writes
        if tid in (0x0000, 0x0020, 0x0021, 0x0022, 0x0030, 0x0031):
            raise ValueError(f"unsupported column type 0x{tid:04x}")
        names.append(name)
        types.append(tid)
    (row_count,) = struct.unpack_from(">i", body, off)
    off += 4
    rows = []
    for _ in range(row_count):
        vals = []
        for tid in types:
            (n,) = struct.unpack_from(">i", body, off)
            off += 4
            if n < 0:
                vals.append(None)
            else:
                vals.append(_decode_value(tid, body[off : off + n]))
                off += n
        rows.append(tuple(vals))
    return Rows(names, types, rows)


def encode_value(type_id: int, v) -> bytes | None:
    """Inverse of :func:`_decode_value` — serialize one typed value for
    a RESULT Rows body (used by the loopback server harness; pinned
    against the decoder by roundtrip tests)."""
    if v is None:
        return None
    if type_id in (TYPE_VARCHAR, TYPE_ASCII):
        return str(v).encode("utf-8")
    if type_id in (TYPE_BIGINT, TYPE_TIMESTAMP):
        return struct.pack(">q", int(v))
    if type_id == TYPE_INT:
        return struct.pack(">i", int(v))
    if type_id == TYPE_SMALLINT:
        return struct.pack(">h", int(v))
    if type_id == TYPE_DOUBLE:
        return struct.pack(">d", float(v))
    if type_id == TYPE_FLOAT:
        return struct.pack(">f", float(v))
    if type_id == TYPE_BOOLEAN:
        return b"\x01" if v else b"\x00"
    if type_id == TYPE_DATE:
        return struct.pack(">I", int(v) + 2**31)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    raise ValueError(f"cannot encode type 0x{type_id:04x}")


CQL_TYPE_IDS = {
    "text": TYPE_VARCHAR,
    "varchar": TYPE_VARCHAR,
    "ascii": TYPE_ASCII,
    "bigint": TYPE_BIGINT,
    "int": TYPE_INT,
    "smallint": TYPE_SMALLINT,
    "double": TYPE_DOUBLE,
    "float": TYPE_FLOAT,
    "boolean": TYPE_BOOLEAN,
    "timestamp": TYPE_TIMESTAMP,
    "date": TYPE_DATE,
    "blob": TYPE_BLOB,
}


def rows_result_body(
    names: list[str],
    type_ids: list[int],
    rows: list[tuple],
    keyspace: str = "ks",
    table: str = "t",
) -> bytes:
    """A RESULT Rows body (global table spec) — the server side of
    :func:`parse_result`, for the loopback harness. Accumulates into a
    bytearray: ``bytes +=`` per cell is O(total²) copying and took a
    50k-row SELECT past the client's 120s timeout at the sf1 validation
    scale."""
    body = bytearray(struct.pack(">i", RESULT_ROWS))
    body += struct.pack(">iI", 0x0001, len(names))
    body += cql_string(keyspace) + cql_string(table)
    for name, tid in zip(names, type_ids):
        body += cql_string(name) + struct.pack(">H", tid)
    body += struct.pack(">i", len(rows))
    for row in rows:
        for tid, v in zip(type_ids, row):
            body += cql_bytes(encode_value(tid, v))
    return bytes(body)


def parse_error(body: bytes) -> str:
    (code,) = struct.unpack_from(">i", body, 0)
    msg, _ = _read_string(body, 4)
    return f"cql error 0x{code:04x}: {msg}"


class CqlError(RuntimeError):
    pass


class CqlClient:
    """Minimal blocking CQL v4 client: STARTUP (+PLAIN auth), QUERY
    with fully-rendered statements, RESULT parsing — the surface the
    Cassandra sink needs. Frames come from the tested pure functions."""

    def __init__(
        self,
        host: str = "localhost",
        port: int = 9042,
        user: str | None = None,
        password: str | None = None,
        connect_timeout: float = 10.0,
        request_timeout: float = 120.0,
    ):
        self.host, self.port = host, port
        self.user, self.password = user, password
        self.request_timeout = request_timeout
        self.connect_timeout = connect_timeout
        self._sock: socket.socket | None = None

    def _recv_exact(self, n: int) -> bytes:
        assert self._sock is not None
        out = b""
        while len(out) < n:
            chunk = self._sock.recv(n - len(out))
            if not chunk:
                raise CqlError("connection closed by server")
            out += chunk
        return out

    def _read_response(self) -> tuple[int, bytes]:
        hdr = self._recv_exact(9)
        _, opcode, length = parse_frame_header(hdr)
        body = self._recv_exact(length) if length else b""
        if opcode == OP_ERROR:
            raise CqlError(parse_error(body))
        return opcode, body

    def connect(self) -> "CqlClient":
        self._sock = socket.create_connection(
            (self.host, self.port), timeout=self.connect_timeout
        )
        # reads after the handshake wait on QUERY responses — a large
        # SELECT legitimately takes longer than a TCP connect
        self._sock.settimeout(self.request_timeout)
        self._sock.sendall(startup_frame())
        opcode, body = self._read_response()
        if opcode == OP_AUTHENTICATE:
            if self.user is None:
                raise CqlError(
                    "server requires authentication; configure "
                    "username/password"
                )
            self._sock.sendall(
                auth_response_frame(self.user, self.password or "")
            )
            opcode, body = self._read_response()
            if opcode not in (OP_AUTH_SUCCESS, OP_READY):
                raise CqlError(f"auth failed (opcode 0x{opcode:02x})")
        elif opcode != OP_READY:
            raise CqlError(f"unexpected startup reply 0x{opcode:02x}")
        return self

    def execute(self, query: str, consistency: str = "LOCAL_ONE"):
        assert self._sock is not None, "not connected"
        self._sock.sendall(query_frame(query, consistency))
        opcode, body = self._read_response()
        if opcode != OP_RESULT:
            raise CqlError(f"unexpected reply 0x{opcode:02x}")
        return parse_result(body)

    def close(self):
        if self._sock is not None:
            self._sock.close()
            self._sock = None

    def __enter__(self) -> "CqlClient":
        return self.connect()

    def __exit__(self, *exc):
        self.close()
