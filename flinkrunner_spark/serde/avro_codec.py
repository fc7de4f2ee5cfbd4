"""Pure-Python Apache Avro BINARY codec (record subset) + Confluent wire
framing + an in-memory schema registry.

Closes the serde gap the spark-avro jar left open (reference:
serde/ConfluentAvroRegistryKafkaRecordSerializationSchema.scala:1-48,
serde/AvroRegistryKafkaRecordDeserializationSchema.scala, and the
EmbeddedAvroRecord pattern in model/EmbeddedAvroRecord.scala): encode a
row to Avro binary, frame it in the Confluent wire format (magic 0x00 +
4-byte big-endian schema id + payload), and back. Everything here is
derived from PUBLIC specifications only — the Apache Avro 1.12 binary
encoding spec and the documented Confluent wire format.

Supported schema subset (what flat event/record streams use):
* ``record`` whose fields are primitives (null, boolean, int, long,
  float, double, bytes, string), nullable unions ``["null", P]``, or
  arrays of primitives; ``logicalType`` attributes (timestamp-micros
  etc.) ride on the underlying primitive untouched, matching Avro's own
  "logical types are annotations" rule.
* Anything else (nested records, maps, enums, fixed) raises at
  ``parse_schema`` time — an honest gate, not a silent wrong answer.

Correctness anchor: the Java implementation (avro-1.12.1.jar ships on the
Spark classpath) is driven through py4j in tests/test_avro.py — the bytes
this codec produces are asserted EQUAL to org.apache.avro's
GenericDatumWriter output for the same records, and each decodes the
other's output.

Scale note: the codec is deliberately dependency-free Python intended for
Arrow-batched ``mapInPandas`` row loops (see serde.avro_encode /
avro_decode). With the spark-avro jar present those entry points use the
JVM ``to_avro``/``from_avro`` instead — this module is the no-jar
fallback and the registry-framing layer, not a replacement for the
codegen path.
"""

from __future__ import annotations

import json
import struct

_PRIMITIVES = {
    "null", "boolean", "int", "long", "float", "double", "bytes", "string",
}

CONFLUENT_MAGIC = 0


# ---------------------------------------------------------------------------
# schema handling
# ---------------------------------------------------------------------------


def _norm_type(t):
    """Normalize one field type to ('prim', name) | ('nullable', name) |
    ('array', name) | ('record', parsed) | ('nullable_record', parsed);
    raise on anything outside the supported subset. Nested records
    recurse through parse_schema, so arbitrarily deep record-in-record
    schemas (e.g. Iceberg manifest_entry → data_file → partition) encode
    and decode; the Spark-facing flat helpers keep rejecting them with a
    clear error (see _spark_ddl_for_avro)."""
    if isinstance(t, str):
        if t in _PRIMITIVES:
            return ("prim", t)
        raise ValueError(f"unsupported avro type: {t!r}")
    if isinstance(t, dict):
        # logical types annotate the underlying primitive — pass through
        base = t.get("type")
        if base in _PRIMITIVES:
            return ("prim", base)
        if base == "record":
            return ("record", parse_schema(t))
        if base == "array":
            items = t.get("items")
            if isinstance(items, str) and items in _PRIMITIVES and items != "null":
                return ("array", items)
            if isinstance(items, dict) and items.get("type") == "record":
                # array of records — how Avro encodes Iceberg's manifest
                # maps (logicalType: map over key/value records)
                return ("array_record", parse_schema(items))
            raise ValueError(f"unsupported array items: {items!r}")
        raise ValueError(f"unsupported avro type: {t!r}")
    if isinstance(t, list):
        if (
            len(t) == 2
            and t[0] == "null"
            and isinstance(t[1], (str, dict))
        ):
            kind, name = _norm_type(t[1])
            if kind == "prim":
                return ("nullable", name)
            if kind == "array":
                return ("nullable_array", name)
            if kind == "record":
                return ("nullable_record", name)
            if kind == "array_record":
                return ("nullable_array_record", name)
        raise ValueError(f"unsupported union: {t!r}")
    raise ValueError(f"unsupported avro type: {t!r}")


def parse_schema(schema) -> dict:
    """Parse/validate an Avro record schema (JSON string or dict) into
    {"name": ..., "fields": [(field_name, (kind, prim)), ...]}."""
    if isinstance(schema, str):
        schema = json.loads(schema)
    if not isinstance(schema, dict) or schema.get("type") != "record":
        raise ValueError("schema must be an avro record")
    fields = []
    for f in schema["fields"]:
        fields.append((f["name"], _norm_type(f["type"])))
    return {"name": schema.get("name", "record"), "fields": fields}


# ---------------------------------------------------------------------------
# binary encoding (Avro spec: zigzag varints, little-endian IEEE floats,
# length-prefixed bytes/string, block-encoded arrays)
# ---------------------------------------------------------------------------


def _write_long(out: bytearray, v: int) -> None:
    z = (v << 1) ^ (v >> 63)  # zigzag
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(buf, pos: int) -> tuple[int, int]:
    shift = z = 0
    while True:
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (z >> 1) ^ -(z & 1), pos  # un-zigzag


def _write_prim(out: bytearray, prim: str, v) -> None:
    if prim == "null":
        return
    if prim == "boolean":
        out.append(1 if v else 0)
    elif prim in ("int", "long"):
        _write_long(out, int(v))
    elif prim == "float":
        out += struct.pack("<f", v)
    elif prim == "double":
        out += struct.pack("<d", v)
    elif prim == "bytes":
        b = bytes(v)
        _write_long(out, len(b))
        out += b
    elif prim == "string":
        b = v.encode("utf-8")
        _write_long(out, len(b))
        out += b
    else:  # pragma: no cover - parse_schema rejects these
        raise ValueError(prim)


def _read_prim(buf, pos: int, prim: str):
    if prim == "null":
        return None, pos
    if prim == "boolean":
        return buf[pos] == 1, pos + 1
    if prim in ("int", "long"):
        return _read_long(buf, pos)
    if prim == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if prim == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if prim in ("bytes", "string"):
        n, pos = _read_long(buf, pos)
        raw = bytes(buf[pos : pos + n])
        return (raw.decode("utf-8") if prim == "string" else raw), pos + n
    raise ValueError(prim)  # pragma: no cover


def _write_array(out: bytearray, prim: str, v) -> None:
    items = list(v if v is not None else [])
    if items:
        _write_long(out, len(items))
        for x in items:
            _write_prim(out, prim, x)
    _write_long(out, 0)  # block terminator


def _write_field(out: bytearray, kind: str, prim, v) -> None:
    """One field's value by its parsed (kind, prim) dispatch — shared by
    the dict path (encode_record) and the pre-bound tuple path
    (bind_row_encoder)."""
    if kind == "prim":
        _write_prim(out, prim, v)
    elif kind == "array":
        _write_array(out, prim, v)
    elif kind == "record":
        out += encode_record(prim, v or {})
    elif kind == "array_record":
        _write_record_array(out, prim, v)
    elif v is None:  # nullable / nullable_array / nullable_record
        _write_long(out, 0)  # union branch 0 = null
    elif kind == "nullable":
        _write_long(out, 1)
        _write_prim(out, prim, v)
    elif kind == "nullable_record":
        _write_long(out, 1)
        out += encode_record(prim, v)
    elif kind == "nullable_array_record":
        _write_long(out, 1)
        _write_record_array(out, prim, v)
    else:  # nullable_array
        _write_long(out, 1)
        _write_array(out, prim, v)


def encode_record(schema: dict, rec: dict) -> bytes:
    """Encode one record (dict) to Avro binary per the parsed schema.
    Nested records are dicts; a nested record encodes as the plain
    concatenation of its fields (Avro spec — records carry no header)."""
    out = bytearray()
    for name, (kind, prim) in schema["fields"]:
        _write_field(out, kind, prim, rec.get(name))
    return bytes(out)


def bind_row_encoder(schema: dict, cols: list[str]):
    """PRE-BOUND row encoder for the Arrow hot path: the per-field kind
    dispatch and the column positions are resolved ONCE, then each row
    arrives as a plain value tuple in ``cols`` order (from zipped column
    arrays — no per-row dict, no pandas Series). Fields absent from
    ``cols`` encode as null, exactly like encode_record's rec.get()."""
    pos = {c: i for i, c in enumerate(cols)}
    steps = [
        (kind, prim, pos.get(name))
        for name, (kind, prim) in schema["fields"]
    ]

    def encode(values) -> bytes:
        out = bytearray()
        for kind, prim, i in steps:
            _write_field(out, kind, prim, None if i is None else values[i])
        return bytes(out)

    return encode


def _write_record_array(out: bytearray, parsed: dict, v) -> None:
    items = list(v if v is not None else [])
    if items:
        _write_long(out, len(items))
        for rec in items:
            out += encode_record(parsed, rec)
    _write_long(out, 0)  # block terminator


def decode_record(schema: dict, data) -> dict:
    """Decode Avro binary back to a dict per the parsed schema."""
    rec, _ = _decode_record_at(schema, memoryview(bytes(data)), 0)
    return rec


# ---------------------------------------------------------------------------
# Confluent wire format + local registry
# ---------------------------------------------------------------------------


def confluent_frame(schema_id: int, payload: bytes) -> bytes:
    """magic 0x00 + 4-byte big-endian schema id + avro binary."""
    return struct.pack(">bI", CONFLUENT_MAGIC, schema_id) + payload


def confluent_unframe(frame: bytes) -> tuple[int, bytes]:
    magic, schema_id = struct.unpack_from(">bI", frame, 0)
    if magic != CONFLUENT_MAGIC:
        raise ValueError(f"bad confluent magic byte: {magic}")
    return schema_id, bytes(frame[5:])


class LocalSchemaRegistry:
    """In-memory schema registry with the subject→id contract of the
    reference's registry clients (the reference likewise swaps in a mock
    client under test — ConfluentAvroRegistryKafkaRecordSerializationSchema
    .scala takes ``schemaRegistryClientOpt``). Ids are assigned once per
    distinct schema, like the real registry."""

    def __init__(self) -> None:
        self._by_id: dict[int, dict] = {}
        self._by_subject: dict[str, int] = {}
        self._canon_to_id: dict[str, int] = {}
        self._next = 1

    def register(self, subject: str, schema) -> int:
        parsed = parse_schema(schema)
        canon = json.dumps(parsed, sort_keys=True)
        sid = self._canon_to_id.get(canon)
        if sid is None:
            sid = self._next
            self._next += 1
            self._canon_to_id[canon] = sid
            self._by_id[sid] = parsed
        self._by_subject[subject] = sid
        return sid

    def schema_by_id(self, schema_id: int) -> dict:
        return self._by_id[schema_id]

    def id_by_subject(self, subject: str) -> int:
        return self._by_subject[subject]


# ---------------------------------------------------------------------------
# Avro Object Container File (OCF) — magic Obj\x01, metadata map, sync-
# marker-delimited blocks, null/deflate codecs (Avro 1.12 spec §Object
# Container Files). Deterministic sync marker (md5 of schema + a salt) so
# outputs are reproducible run to run.
# ---------------------------------------------------------------------------

OCF_MAGIC = b"Obj\x01"


def _ocf_sync(schema: dict, salt: str = "") -> bytes:
    import hashlib

    return hashlib.md5(
        (json.dumps(schema, sort_keys=True) + ":" + salt).encode()
    ).digest()


def write_container(
    schema,
    records,
    codec: str = "null",
    sync_salt: str = "",
    max_block_records: int | None = None,
    extra_meta: dict | None = None,
) -> bytes:
    """Serialize records into one Avro OCF byte string.
    ``max_block_records=None`` emits a single block; a value chunks the
    records into sync-marker-delimited blocks of at most that many rows —
    the unit the split-aware reader parallelizes over. ``extra_meta``
    adds application metadata pairs to the header map (str or bytes
    values) — e.g. Iceberg manifest files carry "schema",
    "partition-spec", "format-version" keys there."""
    import zlib

    if isinstance(schema, str):
        schema = json.loads(schema)
    parsed = parse_schema(schema)
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec: {codec}")
    sync = _ocf_sync(schema, sync_salt)

    out = bytearray(OCF_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    for k, v in (extra_meta or {}).items():
        meta[k] = v.encode() if isinstance(v, str) else bytes(v)
    _write_long(out, len(meta))
    for k, v in sorted(meta.items()):
        _write_prim(out, "string", k)
        _write_prim(out, "bytes", v)
    _write_long(out, 0)  # metadata map terminator
    out += sync

    recs = list(records)
    step = len(recs) if max_block_records is None else max(1, max_block_records)
    for start in range(0, len(recs), step) if recs else ():
        chunk = recs[start : start + step]
        body = bytearray()
        for rec in chunk:
            body += encode_record(parsed, rec)
        data = bytes(body)
        if codec == "deflate":  # raw DEFLATE, no zlib header (per spec)
            comp = zlib.compressobj(wbits=-15)
            data = comp.compress(data) + comp.flush()
        _write_long(out, len(chunk))
        _write_long(out, len(data))
        out += data
        out += sync
    return bytes(out)


def parse_container_header(buf) -> tuple[dict, str, bytes, int]:
    """Parse an OCF header prefix -> (parsed schema, codec, sync marker,
    header length in bytes). Raises IndexError when ``buf`` is too short
    (callers reading from a file grow the prefix and retry)."""
    buf = memoryview(bytes(buf))
    if bytes(buf[:4]) != OCF_MAGIC:
        raise ValueError("not an avro object container file")
    pos = 4
    meta = {}
    while True:
        cnt, pos = _read_long(buf, pos)
        if cnt == 0:
            break
        if cnt < 0:
            cnt = -cnt
            _, pos = _read_long(buf, pos)
        for _ in range(cnt):
            k, pos = _read_prim(buf, pos, "string")
            v, pos = _read_prim(buf, pos, "bytes")
            meta[k] = v
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec: {codec}")
    if pos + 16 > len(buf):
        raise IndexError("header truncated before sync marker")
    sync = bytes(buf[pos : pos + 16])
    return parse_schema(schema), codec, sync, pos + 16


def read_container_meta(blob) -> dict:
    """Header metadata map of an OCF byte string (keys -> bytes values) —
    Iceberg manifests carry their table schema / partition spec here."""
    buf = memoryview(bytes(blob))
    if bytes(buf[:4]) != OCF_MAGIC:
        raise ValueError("not an avro object container file")
    pos = 4
    meta = {}
    while True:
        cnt, pos = _read_long(buf, pos)
        if cnt == 0:
            break
        if cnt < 0:
            cnt = -cnt
            _, pos = _read_long(buf, pos)
        for _ in range(cnt):
            k, pos = _read_prim(buf, pos, "string")
            v, pos = _read_prim(buf, pos, "bytes")
            meta[k] = v
    return meta


def read_container_header(f) -> tuple[dict, str, bytes, int]:
    """Incrementally parse the header from an open binary file — reads a
    growing prefix (4 KiB doubling) instead of the whole file, so header
    inspection of a multi-GB container costs a few KiB of IO."""
    size = 4096
    while True:
        f.seek(0)
        head = f.read(size)
        try:
            return parse_container_header(head)
        except (IndexError, struct.error):
            if len(head) < size:  # whole file read and still truncated
                raise ValueError("truncated avro container header") from None
            size *= 2


def enumerate_container_blocks(
    fpath: str,
) -> tuple[dict, str, bytes, list[tuple[int, int, int]]]:
    """Seek-walk a container's block index -> (parsed schema, codec,
    sync, [(offset, length, n_records), ...]) reading ~40 bytes per block
    (two varint headers + the trailing sync check) — the no-jar analog of
    the jar reader's sync-marker split enumeration. Each (offset, length)
    slice is independently decodable via ``decode_container_block``."""
    import os

    fsize = os.path.getsize(fpath)
    blocks: list[tuple[int, int, int]] = []
    with open(fpath, "rb") as f:
        parsed, codec, sync, pos = read_container_header(f)
        while pos < fsize:
            f.seek(pos)
            head = memoryview(f.read(20))  # two varints, <=10 bytes each
            n, p = _read_long(head, 0)
            size, p = _read_long(head, p)
            end = pos + p + size + 16
            f.seek(end - 16)
            if f.read(16) != sync:
                raise ValueError("sync marker mismatch (corrupt container)")
            blocks.append((pos, end - pos, n))
            pos = end
    return parsed, codec, sync, blocks


def decode_container_block(
    fpath: str, offset: int, length: int, parsed: dict, codec: str, sync: bytes
) -> list[dict]:
    """Decode ONE block slice produced by ``enumerate_container_blocks``
    — opens, seeks, reads ``length`` bytes; never touches the rest of the
    file (parallel-decode unit for the split-aware reader)."""
    import zlib

    with open(fpath, "rb") as f:
        f.seek(offset)
        buf = memoryview(f.read(length))
    n, pos = _read_long(buf, 0)
    size, pos = _read_long(buf, pos)
    data = bytes(buf[pos : pos + size])
    if bytes(buf[pos + size : pos + size + 16]) != sync:
        raise ValueError("sync marker mismatch (corrupt container)")
    if codec == "deflate":
        data = zlib.decompress(data, wbits=-15)
    out: list[dict] = []
    dview = memoryview(data)
    dpos = 0
    for _ in range(n):
        rec, dpos = _decode_record_at(parsed, dview, dpos)
        out.append(rec)
    return out


def read_container(blob) -> tuple[dict, list[dict]]:
    """Parse one Avro OCF byte string -> (parsed schema, records).
    Handles multi-block files (e.g. written by the Java DataFileWriter)
    and the null/deflate codecs."""
    import zlib

    buf = memoryview(bytes(blob))
    parsed, codec, sync, pos = parse_container_header(buf)

    records: list[dict] = []
    total = len(buf)
    while pos < total:
        n, pos = _read_long(buf, pos)
        size, pos = _read_long(buf, pos)
        data = bytes(buf[pos : pos + size])
        pos += size
        if codec == "deflate":
            data = zlib.decompress(data, wbits=-15)
        dpos = 0
        dview = memoryview(data)
        for _ in range(n):
            rec, dpos = _decode_record_at(parsed, dview, dpos)
            records.append(rec)
        if bytes(buf[pos : pos + 16]) != sync:
            raise ValueError("sync marker mismatch (corrupt container)")
        pos += 16
    return parsed, records


def _decode_record_at(schema: dict, buf, pos: int) -> tuple[dict, int]:
    """decode_record variant that starts at ``pos`` and returns the end
    offset — needed to walk concatenated records inside an OCF block."""
    rec = {}

    def read_array(pos, prim):
        items = []
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                break
            if n < 0:
                n = -n
                _, pos = _read_long(buf, pos)
            for _ in range(n):
                x, pos = _read_prim(buf, pos, prim)
                items.append(x)
        return items, pos

    def read_record_array(pos, parsed):
        items = []
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                break
            if n < 0:
                n = -n
                _, pos = _read_long(buf, pos)
            for _ in range(n):
                x, pos = _decode_record_at(parsed, buf, pos)
                items.append(x)
        return items, pos

    for name, (kind, prim) in schema["fields"]:
        if kind == "prim":
            rec[name], pos = _read_prim(buf, pos, prim)
        elif kind == "array":
            rec[name], pos = read_array(pos, prim)
        elif kind == "record":
            rec[name], pos = _decode_record_at(prim, buf, pos)
        elif kind == "array_record":
            rec[name], pos = read_record_array(pos, prim)
        else:
            branch, pos = _read_long(buf, pos)
            if branch == 0:
                rec[name] = None
            elif kind == "nullable":
                rec[name], pos = _read_prim(buf, pos, prim)
            elif kind == "nullable_record":
                rec[name], pos = _decode_record_at(prim, buf, pos)
            elif kind == "nullable_array_record":
                rec[name], pos = read_record_array(pos, prim)
            else:
                rec[name], pos = read_array(pos, prim)
    return rec, pos


# ---------------------------------------------------------------------------
# AWS Glue Schema Registry wire format (reference parity:
# serde/GlueAvroRegistryKafkaRecordSerializationSchema.scala:1-36 /
# GlueAvroRegistryKafkaRecordDeserializationSchema.scala — the
# AWSKafkaAvroSerializer wire layout, publicly documented in the
# aws-glue-schema-registry serializer sources: 1 header-version byte
# (3), 1 compression byte (0 = none, 5 = zlib), 16-byte schema-version
# UUID, then the Avro binary payload).
# ---------------------------------------------------------------------------

GLUE_HEADER_VERSION = 3
GLUE_COMPRESSION_NONE = 0
GLUE_COMPRESSION_ZLIB = 5


def glue_frame(version_uuid: bytes, payload: bytes, compress: bool = False) -> bytes:
    if len(version_uuid) != 16:
        raise ValueError("glue schema-version id must be a 16-byte UUID")
    if compress:
        import zlib

        return (
            bytes([GLUE_HEADER_VERSION, GLUE_COMPRESSION_ZLIB])
            + version_uuid
            + zlib.compress(payload)
        )
    return (
        bytes([GLUE_HEADER_VERSION, GLUE_COMPRESSION_NONE])
        + version_uuid
        + payload
    )


def glue_unframe(frame: bytes) -> tuple[bytes, bytes]:
    """-> (schema-version UUID bytes, avro payload)."""
    if frame[0] != GLUE_HEADER_VERSION:
        raise ValueError(f"bad glue header version: {frame[0]}")
    comp = frame[1]
    uuid_b, payload = bytes(frame[2:18]), bytes(frame[18:])
    if comp == GLUE_COMPRESSION_ZLIB:
        import zlib

        payload = zlib.decompress(payload)
    elif comp != GLUE_COMPRESSION_NONE:
        raise ValueError(f"unsupported glue compression byte: {comp}")
    return uuid_b, payload


class LocalGlueRegistry:
    """In-memory Glue-style registry: schema versions are addressed by
    deterministic 16-byte UUIDs (md5 of the canonical schema — stable
    across processes, like Glue's version ids are stable per schema
    version)."""

    def __init__(self) -> None:
        self._by_uuid: dict[bytes, dict] = {}
        self._by_name: dict[str, bytes] = {}

    def register(self, name: str, schema) -> bytes:
        import hashlib

        parsed = parse_schema(schema)
        vid = hashlib.md5(
            json.dumps(parsed, sort_keys=True).encode()
        ).digest()
        self._by_uuid[vid] = parsed
        self._by_name[name] = vid
        return vid

    def schema_by_uuid(self, vid: bytes) -> dict:
        return self._by_uuid[bytes(vid)]

    def uuid_by_name(self, name: str) -> bytes:
        return self._by_name[name]


# ---------------------------------------------------------------------------
# Avro JSON encodings.
# * json-encoding per the Avro spec (what org.apache.avro's JsonEncoder /
#   JsonDecoder produce/consume): non-null union values wrap as
#   {"<type>": value}, bytes escape as ISO-8859-1 strings.
# * plain JSON (reference parity: serde/AvroJsonSerializer.scala — a
#   jackson serializer that writes friendly, unwrapped JSON).
# ---------------------------------------------------------------------------


def _json_prim(prim: str, v):
    if v is None:
        return None
    if prim == "bytes":
        return bytes(v).decode("latin-1")
    if prim == "float":
        # a float32 widened to float64 prints its long repr; round-trip
        # through the shortest float32 decimal like Java's Float.toString
        return float(struct.unpack("<f", struct.pack("<f", v))[0])
    return v


def _unjson_prim(prim: str, v):
    if v is None:
        return None
    if prim == "bytes":
        return v.encode("latin-1")
    if prim in ("int", "long"):
        return int(v)
    if prim in ("float", "double"):
        return float(v)
    return v


def json_encode_record(schema: dict, rec: dict, spec_unions: bool = True) -> str:
    """Record -> Avro JSON. ``spec_unions=True`` = the spec's
    json-encoding (JsonEncoder-compatible: union values wrapped as
    {"<type>": value}); False = plain JSON (AvroJsonSerializer parity)."""
    out = {}
    for name, (kind, prim) in schema["fields"]:
        v = rec.get(name)
        if kind.endswith("record"):
            raise ValueError(
                "avro JSON encoding supports flat records only "
                f"(field {name!r} is a nested record)"
            )
        if kind == "prim":
            out[name] = _json_prim(prim, v)
        elif kind == "array":
            out[name] = [_json_prim(prim, x) for x in (v or [])]
        elif v is None:
            out[name] = None
        else:
            inner = (
                [_json_prim(prim, x) for x in v]
                if kind == "nullable_array"
                else _json_prim(prim, v)
            )
            branch = "array" if kind == "nullable_array" else prim
            out[name] = {branch: inner} if spec_unions else inner
    return json.dumps(out, separators=(",", ":"))


def json_decode_record(schema: dict, s: str, spec_unions: bool = True) -> dict:
    obj = json.loads(s)
    rec = {}
    for name, (kind, prim) in schema["fields"]:
        v = obj.get(name)
        if kind.endswith("record"):
            raise ValueError(
                "avro JSON decoding supports flat records only "
                f"(field {name!r} is a nested record)"
            )
        if kind == "prim":
            rec[name] = _unjson_prim(prim, v)
        elif kind == "array":
            rec[name] = [_unjson_prim(prim, x) for x in (v or [])]
        elif v is None:
            rec[name] = None
        else:
            if spec_unions:
                branch = "array" if kind == "nullable_array" else prim
                v = v[branch]
            rec[name] = (
                [_unjson_prim(prim, x) for x in v]
                if kind == "nullable_array"
                else _unjson_prim(prim, v)
            )
    return rec


def string_with_confluent_fallback(
    data: bytes | None, registry=None
) -> str | None:
    """Reference `serde/StringDeserializerWithConfluentFallback.scala`:
    a kafka KEY deserializer that treats confluent-framed payloads
    (magic byte 0) as registry-resolved avro rendered to a string, and
    everything else as UTF-8 — the mixed-producer topic case, where some
    writers frame keys and some send plain strings.

    ``registry`` is any object with ``schema_by_id(id) -> schema dict``
    (LocalSchemaRegistry compatible); without one, a framed key decodes
    as the reference does when no deserializer config exists: the raw
    payload after the frame, utf-8-decoded best-effort."""
    if data is None:
        return None
    if data[:1] == bytes([CONFLUENT_MAGIC]) and len(data) >= 5:
        schema_id, payload = confluent_unframe(data)
        if registry is not None:
            # schema_by_id returns the PARSED form (LocalSchemaRegistry
            # stores what parse_schema produced)
            rec = decode_record(registry.schema_by_id(schema_id), payload)
            return json.dumps(rec, sort_keys=True)
        return payload.decode("utf-8", errors="replace")
    return data.decode("utf-8")
