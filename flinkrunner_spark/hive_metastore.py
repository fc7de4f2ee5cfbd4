"""Jar-free Hive Metastore catalog client — Thrift BINARY protocol over
a plain socket, the wire a real HMS (`hive.metastore.uris =
thrift://host:9083`) speaks by default.

Closes the reference's `catalog.type: hive` route
(`IcebergCommonConfig.scala:56-71`, which hands the name to the
iceberg-hive-metastore `CatalogLoader.hive`): an Iceberg HMS table is a
metastore Table whose ``parameters`` carry ``table_type=ICEBERG`` and
``metadata_location`` — resolution is one ``get_table`` RPC, after
which the filesystem reader takes over, exactly like the Glue / Nessie
/ REST catalog paths here.

Commits follow the HiveTableOperations discipline: take the metastore's
EXCLUSIVE table lock, re-read the table UNDER the lock, compare the
current ``metadata_location`` against the expected one (the optimistic
CAS — another committer's pointer swap surfaces as
:class:`HiveCommitConflict`, never a lost update), ``alter_table`` with
the new pointer + ``previous_metadata_location``, and unlock in a
finally. The loopback server (`testing.LoopbackHiveMetastore`) enforces
the lock state machine — a second locker gets WAITING, alter without an
ACQUIRED exclusive lock refuses — so the tests exercise the protocol,
not a mock.

Implemented RPC surface: the Iceberg-catalog subset (``get_table`` /
``create_table`` / ``alter_table`` / ``lock`` / ``check_lock`` /
``unlock``) plus the Hive-table partition RPCs non-Iceberg HMS interop
needs (``add_partitions`` / ``get_partitions`` /
``get_partition_names`` / ``drop_partition`` — the hive_metastore.thrift
Partition struct with values + storage-descriptor location), the
table-level column-statistics RPCs ANALYZE-style interop needs
(``update/get/delete_table_column_statistics`` with the
ColumnStatisticsData union's long/double/string/boolean kinds), and the
Hive UDF registry RPCs (``create/get/drop_function`` +
``get_functions`` pattern listing, ResourceUri jar/file/archive).
Partition-level statistics remain out of scope and absent BY NAME
(Iceberg carries its own per-file stats; nothing here consumes them).
"""

from __future__ import annotations

import os
import socket
import struct

# -- Thrift binary protocol (public spec) -------------------------------------
# Strict framing: message = i32(0x8001_0000 | type), string name, i32
# seqid, then the args/result STRUCT. A struct is a sequence of
# (byte type, i16 field-id, value) terminated by a 0x00 STOP byte.

T_STOP = 0
T_BOOL = 2
T_BYTE = 3
T_DOUBLE = 4
T_I16 = 6
T_I32 = 8
T_I64 = 10
T_STRING = 11
T_STRUCT = 12
T_MAP = 13
T_SET = 14
T_LIST = 15

MSG_CALL = 1
MSG_REPLY = 2
MSG_EXCEPTION = 3

_VERSION_1 = 0x80010000


def enc_string(s: str | bytes) -> bytes:
    b = s.encode() if isinstance(s, str) else s
    return struct.pack(">i", len(b)) + b


def enc_field(ftype: int, fid: int) -> bytes:
    return struct.pack(">bh", ftype, fid)


def enc_message(name: str, mtype: int, seqid: int, body: bytes) -> bytes:
    return (
        struct.pack(">I", _VERSION_1 | mtype)
        + enc_string(name)
        + struct.pack(">i", seqid)
        + body
    )


class ThriftReader:
    """Cursor decoder for the binary protocol; structs come back as
    {field_id: value} dicts (values recursively decoded), so callers
    address fields by their IDL ids without generated classes."""

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def _take(self, fmt: str):
        size = struct.calcsize(fmt)
        (v,) = struct.unpack_from(fmt, self.buf, self.pos)
        self.pos += size
        return v

    def _take_bytes(self, n: int) -> bytes:
        """Bounds-checked slice: a TRUNCATED buffer must raise (the
        unframed transport retries on partial frames), never silently
        return fewer bytes and let the cursor mis-align."""
        if self.pos + n > len(self.buf):
            raise IndexError(
                f"thrift buffer truncated: need {n} bytes at {self.pos}, "
                f"have {len(self.buf)}"
            )
        v = self.buf[self.pos : self.pos + n]
        self.pos += n
        return v

    def read_message_header(self) -> tuple[str, int, int]:
        head = self._take(">I")
        if head & 0xFFFF0000 != _VERSION_1:
            raise ValueError(f"bad thrift version word 0x{head:08x}")
        mtype = head & 0xFF
        n = self._take(">i")
        name = self._take_bytes(n).decode()
        seqid = self._take(">i")
        return name, mtype, seqid

    def read_value(self, ftype: int):
        if ftype == T_BOOL:
            return bool(self._take(">b"))
        if ftype == T_BYTE:
            return self._take(">b")
        if ftype == T_DOUBLE:
            return self._take(">d")
        if ftype == T_I16:
            return self._take(">h")
        if ftype == T_I32:
            return self._take(">i")
        if ftype == T_I64:
            return self._take(">q")
        if ftype == T_STRING:
            n = self._take(">i")
            v = self._take_bytes(n)
            try:
                return v.decode()
            except UnicodeDecodeError:
                return v  # binary field
        if ftype == T_STRUCT:
            return self.read_struct()
        if ftype == T_MAP:
            kt, vt, n = self._take(">b"), self._take(">b"), self._take(">i")
            return {
                self.read_value(kt): self.read_value(vt) for _ in range(n)
            }
        if ftype in (T_LIST, T_SET):
            et, n = self._take(">b"), self._take(">i")
            return [self.read_value(et) for _ in range(n)]
        raise ValueError(f"unsupported thrift type {ftype}")

    def read_struct(self) -> dict:
        out: dict = {}
        while True:
            ftype = self._take(">b")
            if ftype == T_STOP:
                return out
            fid = self._take(">h")
            out[fid] = self.read_value(ftype)


def enc_struct(fields: list[tuple[int, int, bytes]]) -> bytes:
    """fields = [(ftype, fid, encoded_value)] → struct bytes (+STOP)."""
    out = b"".join(
        enc_field(t, i) + v for t, i, v in sorted(fields, key=lambda f: f[1])
    )
    return out + b"\x00"


def enc_map_ss(m: dict[str, str]) -> bytes:
    out = struct.pack(">bbi", T_STRING, T_STRING, len(m))
    for k, v in m.items():
        out += enc_string(str(k)) + enc_string(str(v))
    return out


# -- HMS structs / enums (hive_metastore.thrift, public IDL) ------------------

# Table field ids
TBL_NAME = 1
TBL_DB = 2
TBL_OWNER = 3
TBL_SD = 7
TBL_PARTITION_KEYS = 8
TBL_PARAMETERS = 9
TBL_TABLE_TYPE = 12
# StorageDescriptor field ids
SD_LOCATION = 2
# Partition field ids (hive_metastore.thrift)
PART_VALUES = 1
PART_DB = 2
PART_TABLE = 3
PART_SD = 6
PART_PARAMETERS = 7
# FieldSchema field ids
FS_NAME = 1
FS_TYPE = 2

# hive_metastore.thrift enums (public IDL):
# ColumnStatistics (hive_metastore.thrift): desc + per-column objs;
# the statsData union's field id selects the data kind
CS_DESC = 1
CS_OBJS = 2
CSD_IS_TBL_LEVEL = 1
CSD_DB = 2
CSD_TABLE = 3
CSD_LAST_ANALYZED = 5
CSO_COL_NAME = 1
CSO_COL_TYPE = 2
CSO_DATA = 3
# statsData union field ids → kind names (public hive_metastore.thrift
# union order: 1=booleanStats, 2=longStats, 3=doubleStats,
# 4=stringStats; 5+ binary/decimal/date/timestamp are unsupported and
# refuse on decode rather than misread). Ids verified against the REAL
# generated code, not memory: pyspark's bundled hive-metastore jar,
# `javap -c ColumnStatisticsData` static init constructs
# TField("longStats", STRUCT, 2) / TField("doubleStats", STRUCT, 3),
# and the inner structs match the shapes below (LongColumnStatsData
# low@1/high@2/nulls@3/ndv@4 all i64; StringColumnStatsData maxColLen
# i64@1, avgColLen DOUBLE@2; BooleanColumnStatsData trues@1/falses@2/
# nulls@3; DoubleColumnStatsData low/high DOUBLE@1/@2).
STATS_KINDS = {1: "boolean", 2: "long", 3: "double", 4: "string"}
STATS_FIELD_BY_KIND = {v: k for k, v in STATS_KINDS.items()}

# Function struct (hive_metastore.thrift)
FN_NAME = 1
FN_DB = 2
FN_CLASS = 3
FN_OWNER = 4
FN_OWNER_TYPE = 5
FN_CREATE_TIME = 6
FN_TYPE = 7
FN_RESOURCES = 8
FN_TYPE_JAVA = 1  # FunctionType enum
RES_TYPE = 1  # ResourceUri: JAR=1, FILE=2, ARCHIVE=3
RES_URI = 2
RESOURCE_TYPES = {"jar": 1, "file": 2, "archive": 3}

LOCK_EXCLUSIVE = 3  # LockType: SHARED_READ=1, SHARED_WRITE=2, EXCLUSIVE=3
LOCK_LEVEL_TABLE = 2  # LockLevel: DB=1, TABLE=2, PARTITION=3
LOCK_ACQUIRED = 1  # LockState: ACQUIRED=1, WAITING=2, ABORT=3, NOT_ACQUIRED=4
LOCK_WAITING = 2

ICEBERG_TABLE_TYPE_VALUE = "ICEBERG"
METADATA_LOCATION_PROP = "metadata_location"
PREVIOUS_METADATA_LOCATION_PROP = "previous_metadata_location"


class HiveMetastoreError(RuntimeError):
    pass


class HiveCommitConflict(HiveMetastoreError):
    """The table's metadata_location moved past the expected pointer —
    another committer won the CAS; re-read and retry."""


class NoSuchTable(HiveMetastoreError):
    pass


def enc_list_struct(structs: list[bytes]) -> bytes:
    return struct.pack(">bi", T_STRUCT, len(structs)) + b"".join(structs)


def enc_list_string(items: list[str]) -> bytes:
    return struct.pack(">bi", T_STRING, len(items)) + b"".join(
        enc_string(s) for s in items
    )


def encode_table(
    db: str,
    name: str,
    location: str,
    parameters: dict[str, str],
    owner: str = "flinkrunner",
    partition_keys: list[tuple[str, str]] | None = None,
) -> bytes:
    sd = enc_struct([(T_STRING, SD_LOCATION, enc_string(location))])
    fields = [
        (T_STRING, TBL_NAME, enc_string(name)),
        (T_STRING, TBL_DB, enc_string(db)),
        (T_STRING, TBL_OWNER, enc_string(owner)),
        (T_STRUCT, TBL_SD, sd),
        (T_MAP, TBL_PARAMETERS, enc_map_ss(parameters)),
        (T_STRING, TBL_TABLE_TYPE, enc_string("EXTERNAL_TABLE")),
    ]
    if partition_keys:
        fields.append(
            (
                T_LIST,
                TBL_PARTITION_KEYS,
                enc_list_struct(
                    [
                        enc_struct(
                            [
                                (T_STRING, FS_NAME, enc_string(kn)),
                                (T_STRING, FS_TYPE, enc_string(kt)),
                            ]
                        )
                        for kn, kt in partition_keys
                    ]
                ),
            )
        )
    return enc_struct(fields)


def encode_partition(
    db: str,
    name: str,
    values: list[str],
    location: str,
    parameters: dict[str, str] | None = None,
) -> bytes:
    """One hive_metastore.thrift Partition struct: the value list plus
    a StorageDescriptor carrying the partition directory."""
    sd = enc_struct([(T_STRING, SD_LOCATION, enc_string(location))])
    return enc_struct(
        [
            (T_LIST, PART_VALUES, enc_list_string([str(v) for v in values])),
            (T_STRING, PART_DB, enc_string(db)),
            (T_STRING, PART_TABLE, enc_string(name)),
            (T_STRUCT, PART_SD, sd),
            (T_MAP, PART_PARAMETERS, enc_map_ss(parameters or {})),
        ]
    )


def encode_column_stats_obj(col: str, col_type: str, s: dict) -> bytes:
    """One ColumnStatisticsObj: colName/colType + the statsData UNION —
    the union's field id (STATS_FIELD_BY_KIND) selects the data kind,
    exactly how thrift unions go on the wire (a one-field struct)."""
    kind = str(s.get("kind", "long")).lower()
    if kind == "long":
        data = enc_struct(
            [
                (T_I64, 1, struct.pack(">q", int(s.get("low", 0)))),
                (T_I64, 2, struct.pack(">q", int(s.get("high", 0)))),
                (T_I64, 3, struct.pack(">q", int(s.get("num_nulls", 0)))),
                (T_I64, 4, struct.pack(">q", int(s.get("num_dvs", 0)))),
            ]
        )
    elif kind == "double":
        data = enc_struct(
            [
                (T_DOUBLE, 1, struct.pack(">d", float(s.get("low", 0.0)))),
                (T_DOUBLE, 2, struct.pack(">d", float(s.get("high", 0.0)))),
                (T_I64, 3, struct.pack(">q", int(s.get("num_nulls", 0)))),
                (T_I64, 4, struct.pack(">q", int(s.get("num_dvs", 0)))),
            ]
        )
    elif kind == "string":
        data = enc_struct(
            [
                (T_I64, 1, struct.pack(">q", int(s.get("max_len", 0)))),
                (T_DOUBLE, 2, struct.pack(">d", float(s.get("avg_len", 0.0)))),
                (T_I64, 3, struct.pack(">q", int(s.get("num_nulls", 0)))),
                (T_I64, 4, struct.pack(">q", int(s.get("num_dvs", 0)))),
            ]
        )
    elif kind == "boolean":
        data = enc_struct(
            [
                (T_I64, 1, struct.pack(">q", int(s.get("num_trues", 0)))),
                (T_I64, 2, struct.pack(">q", int(s.get("num_falses", 0)))),
                (T_I64, 3, struct.pack(">q", int(s.get("num_nulls", 0)))),
            ]
        )
    else:
        raise ValueError(
            f"unsupported stats kind {kind!r} "
            f"(one of {sorted(STATS_FIELD_BY_KIND)})"
        )
    union = enc_struct([(T_STRUCT, STATS_FIELD_BY_KIND[kind], data)])
    return enc_struct(
        [
            (T_STRING, CSO_COL_NAME, enc_string(col)),
            (T_STRING, CSO_COL_TYPE, enc_string(col_type)),
            (T_STRUCT, CSO_DATA, union),
        ]
    )


def decode_column_stats_obj(obj: dict) -> dict:
    """Inverse of :func:`encode_column_stats_obj` over a decoded
    ColumnStatisticsObj struct dict."""
    union = obj.get(CSO_DATA) or {}
    fid = next(iter(union), None)
    kind = STATS_KINDS.get(fid)
    if kind is None:
        # binary/decimal/date/timestamp stats (union ids 5-8) are out of
        # scope — refuse loudly instead of decoding the wrong struct's
        # field ids into confidently wrong numbers
        raise HiveMetastoreError(
            f"unsupported ColumnStatisticsData union field id {fid} "
            f"(supported: {sorted(STATS_KINDS)})"
        )
    d = union.get(fid) or {}
    out = {
        "col": str(obj.get(CSO_COL_NAME, "")),
        "type": str(obj.get(CSO_COL_TYPE, "")),
        "kind": kind,
    }
    if kind in ("long", "double"):
        out.update(
            low=d.get(1, 0), high=d.get(2, 0),
            num_nulls=int(d.get(3, 0)), num_dvs=int(d.get(4, 0)),
        )
    elif kind == "string":
        out.update(
            max_len=int(d.get(1, 0)), avg_len=float(d.get(2, 0.0)),
            num_nulls=int(d.get(3, 0)), num_dvs=int(d.get(4, 0)),
        )
    else:  # boolean
        out.update(
            num_trues=int(d.get(1, 0)), num_falses=int(d.get(2, 0)),
            num_nulls=int(d.get(3, 0)),
        )
    return out


class HiveMetastoreClient:
    """One metastore connection; synchronous call/reply, unframed
    binary transport (the HMS default)."""

    def __init__(self, host: str, port: int, timeout_s: float = 30.0):
        self.host, self.port = host, int(port)
        self.timeout_s = timeout_s
        self._sock: socket.socket | None = None
        self._seq = 0

    def __enter__(self) -> "HiveMetastoreClient":
        self._sock = socket.create_connection(
            (self.host, self.port), timeout=self.timeout_s
        )
        return self

    def __exit__(self, *exc):
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = None

    # -- transport ----------------------------------------------------------

    def _call(self, method: str, args_struct: bytes) -> dict:
        """One RPC; returns the result struct ({0: success, k: exc}).
        Unframed transport: the reply length is implied by the protocol,
        so we parse incrementally from a growing buffer."""
        assert self._sock is not None, "use as a context manager"
        self._seq += 1
        self._sock.sendall(
            enc_message(method, MSG_CALL, self._seq, args_struct)
        )
        buf = bytearray()
        while True:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise ConnectionError("metastore closed the connection")
            buf += chunk
            try:
                r = ThriftReader(bytes(buf))
                name, mtype, seqid = r.read_message_header()
                if mtype == MSG_EXCEPTION:
                    exc = r.read_struct()
                    raise HiveMetastoreError(
                        f"{method}: TApplicationException "
                        f"{exc.get(2)}: {exc.get(1)}"
                    )
                result = r.read_struct()
            except (struct.error, IndexError):
                continue  # partial frame — read more
            if seqid != self._seq:
                raise HiveMetastoreError(
                    f"{method}: seqid mismatch {seqid} != {self._seq}"
                )
            return result

    @staticmethod
    def _raise_result_exceptions(method: str, result: dict):
        for fid, v in result.items():
            if fid == 0:
                continue
            msg = v.get(1) if isinstance(v, dict) else v
            if "NoSuchObject" in str(msg) or fid == 2 and method == "get_table":
                raise NoSuchTable(f"{method}: {msg}")
            raise HiveMetastoreError(f"{method}: exception field {fid}: {msg}")

    # -- table RPCs ----------------------------------------------------------

    def get_table(self, db: str, name: str) -> dict:
        result = self._call(
            "get_table",
            enc_struct(
                [
                    (T_STRING, 1, enc_string(db)),
                    (T_STRING, 2, enc_string(name)),
                ]
            ),
        )
        self._raise_result_exceptions("get_table", result)
        if 0 not in result:
            raise NoSuchTable(f"get_table: no table {db}.{name}")
        return result[0]

    def create_table(
        self,
        db: str,
        name: str,
        location: str,
        parameters: dict[str, str],
        partition_keys: list[tuple[str, str]] | None = None,
    ) -> None:
        result = self._call(
            "create_table",
            enc_struct(
                [
                    (
                        T_STRUCT,
                        1,
                        encode_table(
                            db, name, location, parameters,
                            partition_keys=partition_keys,
                        ),
                    )
                ]
            ),
        )
        for fid, v in result.items():
            if fid != 0:
                raise HiveMetastoreError(f"create_table: {v}")

    # -- partition RPCs (Hive-table interop beyond the Iceberg catalog) ------

    def add_partitions(
        self,
        db: str,
        name: str,
        partitions: list[tuple[list[str], str]],
        parameters: dict[str, str] | None = None,
    ) -> int:
        """add_partitions(list<Partition>) -> count added. Each entry is
        (values, location) — the metastore registers the value tuple
        and its directory; AlreadyExists surfaces as an error, like a
        real HMS (use one value tuple once)."""
        structs = [
            encode_partition(db, name, vals, loc, parameters)
            for vals, loc in partitions
        ]
        result = self._call(
            "add_partitions",
            enc_struct([(T_LIST, 1, enc_list_struct(structs))]),
        )
        self._raise_result_exceptions("add_partitions", result)
        return int(result.get(0, 0))

    def get_partitions(
        self, db: str, name: str, max_parts: int = -1
    ) -> list[dict]:
        """-> [{"values": [...], "location": str, "parameters": {...}}]
        sorted by value tuple (deterministic like get_partition_names)."""
        result = self._call(
            "get_partitions",
            enc_struct(
                [
                    (T_STRING, 1, enc_string(db)),
                    (T_STRING, 2, enc_string(name)),
                    (T_I16, 3, struct.pack(">h", max_parts)),
                ]
            ),
        )
        self._raise_result_exceptions("get_partitions", result)
        out = []
        for p in result.get(0, []) or []:
            sd = p.get(PART_SD) or {}
            out.append(
                {
                    "values": list(p.get(PART_VALUES) or []),
                    "location": str(sd.get(SD_LOCATION, "")),
                    "parameters": dict(p.get(PART_PARAMETERS) or {}),
                }
            )
        return out

    def get_partition_names(
        self, db: str, name: str, max_parts: int = -1
    ) -> list[str]:
        """-> ["k1=v1/k2=v2", ...] built from the table's partitionKeys
        (the Hive partition-path convention)."""
        result = self._call(
            "get_partition_names",
            enc_struct(
                [
                    (T_STRING, 1, enc_string(db)),
                    (T_STRING, 2, enc_string(name)),
                    (T_I16, 3, struct.pack(">h", max_parts)),
                ]
            ),
        )
        self._raise_result_exceptions("get_partition_names", result)
        return [str(s) for s in result.get(0, []) or []]

    def drop_partition(
        self, db: str, name: str, values: list[str],
        delete_data: bool = False,
    ) -> bool:
        result = self._call(
            "drop_partition",
            enc_struct(
                [
                    (T_STRING, 1, enc_string(db)),
                    (T_STRING, 2, enc_string(name)),
                    (
                        T_LIST,
                        3,
                        enc_list_string([str(v) for v in values]),
                    ),
                    (T_BOOL, 4, struct.pack(">b", 1 if delete_data else 0)),
                ]
            ),
        )
        self._raise_result_exceptions("drop_partition", result)
        return bool(result.get(0, False))

    # -- column-statistics RPCs (ANALYZE TABLE interop) -----------------------

    def update_table_column_statistics(
        self, db: str, name: str, stats: list[dict],
        last_analyzed: int = 0,
    ) -> bool:
        """update_table_column_statistics(ColumnStatistics) — store
        table-level per-column stats the way Hive's ANALYZE TABLE ...
        COMPUTE STATISTICS FOR COLUMNS does. Each entry:
        ``{"col", "type", "kind": long|double|string|boolean, ...}``
        with the kind's fields (low/high/num_nulls/num_dvs for
        long/double, max_len/avg_len for string, num_trues/num_falses
        for boolean) — the thrift ColumnStatisticsData union."""
        objs = [
            encode_column_stats_obj(
                str(s["col"]), str(s.get("type", "")), s
            )
            for s in stats
        ]
        desc = enc_struct(
            [
                (T_BOOL, CSD_IS_TBL_LEVEL, struct.pack(">b", 1)),
                (T_STRING, CSD_DB, enc_string(db)),
                (T_STRING, CSD_TABLE, enc_string(name)),
                (T_I64, CSD_LAST_ANALYZED, struct.pack(">q", last_analyzed)),
            ]
        )
        result = self._call(
            "update_table_column_statistics",
            enc_struct(
                [
                    (
                        T_STRUCT,
                        1,
                        enc_struct(
                            [
                                (T_STRUCT, CS_DESC, desc),
                                (T_LIST, CS_OBJS, enc_list_struct(objs)),
                            ]
                        ),
                    )
                ]
            ),
        )
        self._raise_result_exceptions(
            "update_table_column_statistics", result
        )
        return bool(result.get(0, False))

    def get_table_column_statistics(
        self, db: str, name: str, col: str
    ) -> dict:
        """-> the column's stats dict (same shape update takes), with
        ``col``/``type``/``kind`` filled from the stored object."""
        result = self._call(
            "get_table_column_statistics",
            enc_struct(
                [
                    (T_STRING, 1, enc_string(db)),
                    (T_STRING, 2, enc_string(name)),
                    (T_STRING, 3, enc_string(col)),
                ]
            ),
        )
        self._raise_result_exceptions("get_table_column_statistics", result)
        cs = result.get(0) or {}
        objs = cs.get(CS_OBJS) or []
        if not objs:
            raise NoSuchTable(
                f"get_table_column_statistics: no stats for "
                f"{db}.{name}.{col}"
            )
        return decode_column_stats_obj(objs[0])

    def delete_table_column_statistics(
        self, db: str, name: str, col: str
    ) -> bool:
        result = self._call(
            "delete_table_column_statistics",
            enc_struct(
                [
                    (T_STRING, 1, enc_string(db)),
                    (T_STRING, 2, enc_string(name)),
                    (T_STRING, 3, enc_string(col)),
                ]
            ),
        )
        self._raise_result_exceptions(
            "delete_table_column_statistics", result
        )
        return bool(result.get(0, False))

    # -- function RPCs (Hive UDF registry interop) ----------------------------

    def create_function(
        self,
        db: str,
        name: str,
        class_name: str,
        owner: str = "",
        resources: list[tuple[str, str]] | None = None,
        create_time: int = 0,
    ) -> None:
        """create_function(Function) — register a Hive UDF by class
        name, with optional (type, uri) resources (jar|file|archive)."""
        res = enc_list_struct(
            [
                enc_struct(
                    [
                        (
                            T_I32,
                            RES_TYPE,
                            struct.pack(
                                ">i",
                                RESOURCE_TYPES.get(str(t).lower(), 1),
                            ),
                        ),
                        (T_STRING, RES_URI, enc_string(u)),
                    ]
                )
                for t, u in (resources or [])
            ]
        )
        fn = enc_struct(
            [
                (T_STRING, FN_NAME, enc_string(name)),
                (T_STRING, FN_DB, enc_string(db)),
                (T_STRING, FN_CLASS, enc_string(class_name)),
                (T_STRING, FN_OWNER, enc_string(owner)),
                (T_I32, FN_OWNER_TYPE, struct.pack(">i", 1)),  # USER
                (T_I32, FN_CREATE_TIME, struct.pack(">i", create_time)),
                (T_I32, FN_TYPE, struct.pack(">i", FN_TYPE_JAVA)),
                (T_LIST, FN_RESOURCES, res),
            ]
        )
        result = self._call(
            "create_function", enc_struct([(T_STRUCT, 1, fn)])
        )
        self._raise_result_exceptions("create_function", result)

    def get_function(self, db: str, name: str) -> dict:
        result = self._call(
            "get_function",
            enc_struct(
                [
                    (T_STRING, 1, enc_string(db)),
                    (T_STRING, 2, enc_string(name)),
                ]
            ),
        )
        self._raise_result_exceptions("get_function", result)
        fn = result.get(0)
        if not fn:
            raise NoSuchTable(f"get_function: no function {db}.{name}")
        return {
            "name": str(fn.get(FN_NAME, "")),
            "db": str(fn.get(FN_DB, "")),
            "class_name": str(fn.get(FN_CLASS, "")),
            "owner": str(fn.get(FN_OWNER, "")),
            "resources": [
                (
                    {v: k for k, v in RESOURCE_TYPES.items()}.get(
                        int(r.get(RES_TYPE, 1)), "jar"
                    ),
                    str(r.get(RES_URI, "")),
                )
                for r in (fn.get(FN_RESOURCES) or [])
            ],
        }

    def get_functions(self, db: str, pattern: str = "*") -> list[str]:
        result = self._call(
            "get_functions",
            enc_struct(
                [
                    (T_STRING, 1, enc_string(db)),
                    (T_STRING, 2, enc_string(pattern)),
                ]
            ),
        )
        self._raise_result_exceptions("get_functions", result)
        return [str(s) for s in result.get(0, []) or []]

    def drop_function(self, db: str, name: str) -> None:
        result = self._call(
            "drop_function",
            enc_struct(
                [
                    (T_STRING, 1, enc_string(db)),
                    (T_STRING, 2, enc_string(name)),
                ]
            ),
        )
        self._raise_result_exceptions("drop_function", result)

    def _alter_table(self, db: str, name: str, table_struct: bytes) -> None:
        result = self._call(
            "alter_table",
            enc_struct(
                [
                    (T_STRING, 1, enc_string(db)),
                    (T_STRING, 2, enc_string(name)),
                    (T_STRUCT, 3, table_struct),
                ]
            ),
        )
        for fid, v in result.items():
            if fid != 0:
                raise HiveMetastoreError(f"alter_table: {v}")

    # -- lock RPCs (the commit mutex) -----------------------------------------

    def lock_exclusive(self, db: str, name: str) -> tuple[int, int]:
        """-> (lockid, state). One EXCLUSIVE table-level component, the
        lock HiveTableOperations takes around a pointer swap."""
        component = enc_struct(
            [
                (T_I32, 1, struct.pack(">i", LOCK_EXCLUSIVE)),
                (T_I32, 2, struct.pack(">i", LOCK_LEVEL_TABLE)),
                (T_STRING, 3, enc_string(db)),
                (T_STRING, 4, enc_string(name)),
            ]
        )
        req = enc_struct(
            [
                (T_LIST, 1, struct.pack(">bi", T_STRUCT, 1) + component),
                (T_STRING, 3, enc_string("flinkrunner")),
                (T_STRING, 4, enc_string(socket.gethostname())),
            ]
        )
        result = self._call("lock", enc_struct([(T_STRUCT, 1, req)]))
        self._raise_result_exceptions("lock", result)
        resp = result[0]
        return int(resp[1]), int(resp[2])

    def check_lock(self, lockid: int) -> int:
        req = enc_struct([(T_I64, 1, struct.pack(">q", lockid))])
        result = self._call("check_lock", enc_struct([(T_STRUCT, 1, req)]))
        self._raise_result_exceptions("check_lock", result)
        return int(result[0][2])

    def unlock(self, lockid: int) -> None:
        req = enc_struct([(T_I64, 1, struct.pack(">q", lockid))])
        result = self._call("unlock", enc_struct([(T_STRUCT, 1, req)]))
        for fid, v in result.items():
            if fid != 0:
                raise HiveMetastoreError(f"unlock: {v}")

    # -- iceberg catalog surface ----------------------------------------------

    def metadata_location(self, db: str, name: str) -> str:
        t = self.get_table(db, name)
        params = t.get(TBL_PARAMETERS) or {}
        if (
            str(params.get("table_type", "")).upper()
            != ICEBERG_TABLE_TYPE_VALUE
        ):
            raise HiveMetastoreError(
                f"{db}.{name} is not an Iceberg table (table_type="
                f"{params.get('table_type')!r}); this client resolves "
                "Iceberg pointers only"
            )
        loc = params.get(METADATA_LOCATION_PROP)
        if not loc:
            raise HiveMetastoreError(
                f"{db}.{name} has no {METADATA_LOCATION_PROP} parameter"
            )
        return loc

    def table_location(self, db: str, name: str) -> str:
        """Table root = two levels above the metadata file (HadoopTables
        layout), same resolution as the Glue / Nessie clients here."""
        return os.path.dirname(
            os.path.dirname(self.metadata_location(db, name))
        )

    def register_fs_table(self, db: str, name: str, fs_table) -> None:
        """First publish of a filesystem table's metadata pointer."""
        md_path = os.path.join(
            fs_table.meta_dir, f"v{fs_table._version()}.metadata.json"
        )
        self.create_table(
            db,
            name,
            fs_table.location,
            {
                "table_type": ICEBERG_TABLE_TYPE_VALUE,
                METADATA_LOCATION_PROP: md_path,
                "EXTERNAL": "TRUE",
            },
        )

    def commit_swap(
        self, db: str, name: str, expected: str, new_location: str
    ) -> None:
        """The HiveTableOperations commit: EXCLUSIVE lock → re-read
        UNDER the lock → CAS against ``expected`` → alter with the new
        pointer (+ previous_metadata_location lineage) → unlock."""
        lockid, state = self.lock_exclusive(db, name)
        try:
            while state == LOCK_WAITING:
                state = self.check_lock(lockid)
            if state != LOCK_ACQUIRED:
                raise HiveMetastoreError(
                    f"lock on {db}.{name} not acquired (state {state})"
                )
            t = self.get_table(db, name)
            params = dict(t.get(TBL_PARAMETERS) or {})
            current = params.get(METADATA_LOCATION_PROP)
            if current != expected:
                raise HiveCommitConflict(
                    f"{db}.{name}: metadata_location is {current!r}, "
                    f"expected {expected!r} — concurrent commit won"
                )
            params[PREVIOUS_METADATA_LOCATION_PROP] = current or ""
            params[METADATA_LOCATION_PROP] = new_location
            sd = t.get(TBL_SD) or {}
            self._alter_table(
                db,
                name,
                encode_table(
                    db, name, sd.get(SD_LOCATION, ""), params,
                    owner=str(t.get(TBL_OWNER, "flinkrunner")),
                ),
            )
        finally:
            self.unlock(lockid)


    def commit_fs_table(self, db: str, name: str, fs_table) -> None:
        """Publish a filesystem table's CURRENT tip (register on first
        publish). Same lineage discipline as the Glue/Nessie clients:
        the catalog pointer may lag several filesystem commits, so any
        OLDER version of this table's own metadata lineage advances via
        the locked CAS; a pointer newer than ours or from a different
        lineage is a concurrent writer — conflict, re-read and retry."""
        import re

        try:
            t = self.get_table(db, name)
        except NoSuchTable:
            self.register_fs_table(db, name, fs_table)
            return
        ours = int(fs_table._version())
        new = os.path.join(fs_table.meta_dir, f"v{ours}.metadata.json")
        cur = str((t.get(TBL_PARAMETERS) or {}).get(
            METADATA_LOCATION_PROP, ""
        ))
        if cur == new:
            return  # already at this tip
        m = re.fullmatch(
            re.escape(fs_table.meta_dir) + r"/v(\d+)\.metadata\.json", cur
        )
        if not m or int(m.group(1)) > ours:
            raise HiveCommitConflict(
                f"metastore points {db}.{name} at {cur!r} — not an "
                "older version of this table's lineage; concurrent "
                "writer, re-read and retry"
            )
        self.commit_swap(db, name, cur, new)


def hive_from_conf(conf: dict) -> HiveMetastoreClient:
    """Build the client from reference-style catalog conf:
    ``catalog.uri: thrift://host:9083`` (the `hive.metastore.uris`
    value `CatalogLoader.hive` reads)."""
    uri = str(conf.get("catalog.uri", ""))
    if not uri.startswith("thrift://"):
        raise ValueError(
            "catalog.type hive needs catalog.uri thrift://host:port "
            f"(got {uri!r})"
        )
    hostport = uri[len("thrift://") :].rstrip("/")
    host, _, port = hostport.partition(":")
    return HiveMetastoreClient(host, int(port or 9083))
