"""Confluent Schema Registry HTTP client — the network twin of
`avro_codec.LocalSchemaRegistry`.

The reference's serializers resolve schemas through a registry client
configured by ``schema.registry.url``
(`serde/ConfluentAvroRegistryKafkaRecordSerializationSchema.scala`,
`deserialization/ConfluentAvroRegistryKafkaRecordDeserialization
Schema.scala`); under test they swap in a mock via
``schemaRegistryClientOpt``. This client speaks the public registry
REST API (docs.confluent.io — POST /subjects/{s}/versions,
GET /schemas/ids/{id}, GET /subjects/{s}/versions/latest) with the
v1 content type, optional basic auth, and id→schema memoization, and
satisfies the same three-method contract the codec layer already
depends on — so `serde.confluent_avro_encode/decode` work against a
real registry with zero changes. Schema resolution happens driver-side
only (the parsed schema ships to executors inside the Arrow codec
closure), so one registry lookup serves any number of tasks: at
100 TB the registry sees O(queries), not O(records).
"""

from __future__ import annotations

import base64
import json
import urllib.error
import urllib.request

CONTENT_TYPE = "application/vnd.schemaregistry.v1+json"


class SchemaRegistryError(RuntimeError):
    def __init__(self, status: int, code: int | None, message: str):
        super().__init__(
            f"schema registry error {status}"
            + (f" (code {code})" if code is not None else "")
            + f": {message}"
        )
        self.status = status
        self.code = code


class HttpSchemaRegistry:
    """Minimal Confluent-REST registry client with the
    `LocalSchemaRegistry` contract: ``register(subject, schema) -> id``,
    ``schema_by_id(id) -> parsed``, ``id_by_subject(subject) -> id``."""

    def __init__(
        self, url: str, auth: str | None = None, timeout_s: float = 30.0
    ):
        self.url = url.rstrip("/")
        self.auth = auth  # "user:password" basic credentials
        self.timeout_s = timeout_s
        self._by_id: dict[int, dict] = {}

    # -- transport ---------------------------------------------------------

    def _request(self, method: str, path: str, body: dict | None = None):
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(
            f"{self.url}{path}", data=data, method=method
        )
        req.add_header("Accept", CONTENT_TYPE)
        if data is not None:
            req.add_header("Content-Type", CONTENT_TYPE)
        if self.auth:
            token = base64.b64encode(self.auth.encode()).decode()
            req.add_header("Authorization", f"Basic {token}")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                return json.loads(resp.read().decode())
        except urllib.error.HTTPError as e:
            try:
                err = json.loads(e.read().decode())
            except Exception:
                err = {}
            raise SchemaRegistryError(
                e.code, err.get("error_code"), err.get("message", str(e))
            ) from None

    # -- contract ----------------------------------------------------------

    def register(self, subject: str, schema) -> int:
        """``schema`` is Avro JSON (str or dict) — the REST wire carries
        real Avro JSON per the registry API; the parsed internal form
        (what `confluent_avro_encode/decode` consume from
        ``schema_by_id``) is memoized locally."""
        from flinkrunner_spark.serde.avro_codec import parse_schema

        parsed = parse_schema(schema)  # validates before the wire
        if isinstance(schema, str):
            schema = json.loads(schema)
        out = self._request(
            "POST",
            f"/subjects/{subject}/versions",
            {"schema": json.dumps(schema)},
        )
        sid = int(out["id"])
        self._by_id[sid] = parsed
        return sid

    def schema_by_id(self, schema_id: int) -> dict:
        if schema_id not in self._by_id:
            from flinkrunner_spark.serde.avro_codec import parse_schema

            out = self._request("GET", f"/schemas/ids/{schema_id}")
            self._by_id[schema_id] = parse_schema(out["schema"])
        return self._by_id[schema_id]

    def id_by_subject(self, subject: str) -> int:
        out = self._request("GET", f"/subjects/{subject}/versions/latest")
        return int(out["id"])


def registry_from_conf(conf: dict):
    """The reference's config surface: ``schema.registry.url`` selects
    the HTTP client (with optional ``schema.registry.auth``
    "user:password"); absent, the caller's injected in-memory registry
    (the `schemaRegistryClientOpt` seam) is the only option."""
    url = conf.get("schema.registry.url")
    if not url:
        return None
    return HttpSchemaRegistry(url, auth=conf.get("schema.registry.auth"))
