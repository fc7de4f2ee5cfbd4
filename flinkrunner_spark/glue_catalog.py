"""AWS Glue Data Catalog client for Iceberg tables — pure stdlib.

Reference parity: `model/IcebergCommonConfig.scala:14-78` routes
``catalog.type: glue`` to the iceberg-aws GlueCatalog. That integration
follows a PUBLIC convention (Apache Iceberg AWS module docs): a Glue
*Database* is the namespace, a Glue *Table* carries
``Parameters.table_type = "ICEBERG"`` and
``Parameters.metadata_location`` pointing at the current
``vN.metadata.json``; a commit swaps ``metadata_location`` (recording
the old one as ``previous_metadata_location``) after re-checking the
current pointer — optimistic concurrency by compare-then-swap.

Transport is the public Glue JSON API: SigV4-signed POSTs
(``X-Amz-Target: AWSGlue.<Op>``, ``application/x-amz-json-1.1``) built
with `util/aws_signer` — the same no-SDK pattern as the
kinesis/firehose sinks. Request construction is offline-testable; the
network call is gated on credentials, with ``endpoint`` override for
localstack-style testing (`testing.LoopbackGlueCatalog`).

Scale note: the catalog sees O(commits) tiny JSON calls — table data
never touches this path; readers resolve ``metadata_location`` once
and scan the filesystem/parquet directly.
"""

from __future__ import annotations

import json
import os
import time
import urllib.error
import urllib.request

_JSON11 = "application/x-amz-json-1.1"


class GlueCatalogError(RuntimeError):
    pass


class GlueCommitConflict(GlueCatalogError):
    """The current metadata_location no longer matches the expected
    previous pointer — another writer committed first; re-read and
    retry (the iceberg-aws optimistic-locking contract)."""


class GlueCatalog:
    _SERVICE = "glue"

    def __init__(self, conf: dict | None = None):
        self.conf = dict(conf or {})
        self.region = self.conf.get("region", "us-east-1")
        self.endpoint = self.conf.get(
            "endpoint", f"https://glue.{self.region}.amazonaws.com/"
        )

    # -- request builders (offline-testable) --------------------------------

    def get_database_request(self, db: str) -> tuple[str, bytes]:
        return "AWSGlue.GetDatabase", json.dumps({"Name": db}).encode()

    def create_database_request(self, db: str) -> tuple[str, bytes]:
        return (
            "AWSGlue.CreateDatabase",
            json.dumps({"DatabaseInput": {"Name": db}}).encode(),
        )

    def get_table_request(self, db: str, name: str) -> tuple[str, bytes]:
        return (
            "AWSGlue.GetTable",
            json.dumps({"DatabaseName": db, "Name": name}).encode(),
        )

    def _table_input(
        self,
        name: str,
        metadata_location: str,
        previous_metadata_location: str | None,
    ) -> dict:
        params = {
            "table_type": "ICEBERG",
            "metadata_location": metadata_location,
        }
        if previous_metadata_location:
            params["previous_metadata_location"] = previous_metadata_location
        return {
            "Name": name,
            "TableType": "EXTERNAL_TABLE",
            "Parameters": params,
        }

    def create_table_request(
        self, db: str, name: str, metadata_location: str
    ) -> tuple[str, bytes]:
        return (
            "AWSGlue.CreateTable",
            json.dumps(
                {
                    "DatabaseName": db,
                    "TableInput": self._table_input(
                        name, metadata_location, None
                    ),
                }
            ).encode(),
        )

    def update_table_request(
        self,
        db: str,
        name: str,
        metadata_location: str,
        previous_metadata_location: str,
    ) -> tuple[str, bytes]:
        return (
            "AWSGlue.UpdateTable",
            json.dumps(
                {
                    "DatabaseName": db,
                    "TableInput": self._table_input(
                        name, metadata_location, previous_metadata_location
                    ),
                }
            ).encode(),
        )

    # -- transport ----------------------------------------------------------

    def _credentials(self):
        from flinkrunner_spark.util.aws_signer import AwsCredentials

        key = self.conf.get("aws.access.key.id")
        if not key:
            raise NotImplementedError(
                "glue catalog: request construction + signing are "
                "implemented, but calls need credentials "
                "(aws.access.key.id / aws.secret.access.key) — none "
                "configured"
            )
        return AwsCredentials(
            key,
            self.conf.get("aws.secret.access.key", ""),
            self.conf.get("aws.session.token"),
        )

    def signed_headers(
        self, target: str, body: bytes, amz_date: str
    ) -> dict:
        from flinkrunner_spark.util.aws_signer import sign_request

        return sign_request(
            method="POST",
            url=self.endpoint,
            headers={"Content-Type": _JSON11, "X-Amz-Target": target},
            payload=body,
            credentials=self._credentials(),
            region=self.region,
            amz_date=amz_date,
            service=self._SERVICE,
        )

    def _call(self, target: str, body: bytes) -> dict:
        amz = time.strftime("%Y%m%dT%H%M%SZ", time.gmtime())
        req = urllib.request.Request(
            self.endpoint,
            data=body,
            headers=self.signed_headers(target, body, amz),
            method="POST",
        )
        try:
            raw = urllib.request.urlopen(req).read()
        except urllib.error.HTTPError as e:
            try:
                err = json.loads(e.read().decode())
            except Exception:
                err = {}
            raise GlueCatalogError(
                f"{target} failed ({e.code}): "
                f"{err.get('__type', '')} {err.get('Message', '')}"
            ) from None
        return json.loads(raw) if raw else {}

    # -- high-level operations ----------------------------------------------

    def ensure_database(self, db: str) -> None:
        try:
            self._call(*self.get_database_request(db))
        except GlueCatalogError as e:
            if "EntityNotFound" not in str(e):
                raise
            self._call(*self.create_database_request(db))

    def metadata_location(self, db: str, name: str) -> str:
        out = self._call(*self.get_table_request(db, name))
        params = out.get("Table", {}).get("Parameters", {})
        if params.get("table_type", "").upper() != "ICEBERG":
            raise GlueCatalogError(
                f"glue table {db}.{name} is not an iceberg table "
                f"(table_type={params.get('table_type')!r})"
            )
        loc = params.get("metadata_location")
        if not loc:
            raise GlueCatalogError(
                f"glue table {db}.{name} has no metadata_location"
            )
        return loc

    def table_location(self, db: str, name: str) -> str:
        """Table root = dirname of metadata/ = two levels above the
        metadata file (HadoopTables layout)."""
        return os.path.dirname(
            os.path.dirname(self.metadata_location(db, name))
        )

    def register_fs_table(self, db: str, name: str, fs_table) -> None:
        """First publish: CreateTable pointing at the table's current
        metadata file."""
        self.ensure_database(db)
        md_path = os.path.join(
            fs_table.meta_dir, f"v{fs_table._version()}.metadata.json"
        )
        self._call(*self.create_table_request(db, name, md_path))

    def commit_swap(self, db: str, name: str, fs_table) -> None:
        """Later publishes: compare-then-swap the metadata pointer. The
        pointer may legitimately lag by SEVERAL versions (filesystem
        commits made without the catalog in between), so any OLDER
        version of this table's own metadata lineage advances; a pointer
        that is newer than ours, or from a different lineage entirely,
        is a concurrent writer — raise, re-read and retry."""
        import re

        current = self.metadata_location(db, name)
        ours = int(fs_table._version())
        new = os.path.join(fs_table.meta_dir, f"v{ours}.metadata.json")
        if current == new:
            return  # already at this tip
        m = re.fullmatch(
            re.escape(fs_table.meta_dir) + r"/v(\d+)\.metadata\.json",
            current,
        )
        if m is None or int(m.group(1)) > ours:
            raise GlueCommitConflict(
                f"glue pointer for {db}.{name} is {current!r} — not an "
                f"older version of {new!r}; concurrent commit, re-read "
                "and retry"
            )
        self._call(
            *self.update_table_request(db, name, new, current)
        )


def glue_from_conf(conf: dict) -> GlueCatalog:
    """Build from the sink/source's ``catalog.*`` config keys."""
    from flinkrunner_spark.config import strip_catalog_conf

    return GlueCatalog(strip_catalog_conf(conf, exclude=("catalog.type",)))


class GlueSchemaRegistry(GlueCatalog):
    """AWS Glue SCHEMA REGISTRY client — the network twin of
    `avro_codec.LocalGlueRegistry`, satisfying the same three-method
    contract (``register(name, schema) -> 16-byte uuid``,
    ``schema_by_uuid(uuid) -> parsed``, ``uuid_by_name(name) ->
    uuid``) over the public Glue API (RegisterSchemaVersion /
    CreateSchema / GetSchemaVersion as SigV4-signed x-amz-json-1.1
    POSTs — the AWSKafkaAvroSerializer's resolution path in the
    reference's GlueAvroRegistryKafkaRecord*Schema.scala, selected by
    ``schema.registry`` type aws_glue in SchemaRegistryConfig.scala).
    Resolution is driver-side and memoized: the registry sees
    O(queries) calls at any data scale."""

    def __init__(self, conf: dict | None = None):
        super().__init__(conf)
        self.registry_name = (self.conf or {}).get(
            "registry.name", "default-registry"
        )
        self._by_uuid: dict[bytes, dict] = {}

    @staticmethod
    def _to_bytes(version_id: str) -> bytes:
        import uuid as _uuid

        return _uuid.UUID(version_id).bytes

    def register(self, name: str, schema) -> bytes:
        from flinkrunner_spark.serde.avro_codec import parse_schema

        parsed = parse_schema(schema)  # validate before the wire
        definition = json.dumps(
            json.loads(schema) if isinstance(schema, str) else schema
        )
        sid = {"RegistryName": self.registry_name, "SchemaName": name}

        def register_version():
            return self._call(
                "AWSGlue.RegisterSchemaVersion",
                json.dumps(
                    {"SchemaId": sid, "SchemaDefinition": definition}
                ).encode(),
            )

        try:
            out = register_version()
        except GlueCatalogError as e:
            if "EntityNotFound" not in str(e):
                raise
            try:
                out = self._call(
                    "AWSGlue.CreateSchema",
                    json.dumps(
                        {
                            "RegistryId": {
                                "RegistryName": self.registry_name
                            },
                            "SchemaName": name,
                            "DataFormat": "AVRO",
                            "Compatibility": "BACKWARD",
                            "SchemaDefinition": definition,
                        }
                    ).encode(),
                )
            except GlueCatalogError as e2:
                # create race: a concurrent writer created the schema
                # between our two calls — registering the version now
                # succeeds
                if "AlreadyExists" not in str(e2):
                    raise
                out = register_version()
        vid = self._to_bytes(out["SchemaVersionId"])
        # registration is ASYNC on real Glue: PENDING resolves, FAILURE
        # (incompatible evolution) never becomes AVAILABLE — framing
        # messages with a failed version id would make the topic
        # permanently undecodable, so wait for AVAILABLE
        status = out.get("Status", "AVAILABLE")
        tries = 0
        while status == "PENDING" and tries < 20:
            import time as _time

            _time.sleep(0.25)
            chk = self._call(
                "AWSGlue.GetSchemaVersion",
                json.dumps(
                    {"SchemaVersionId": out["SchemaVersionId"]}
                ).encode(),
            )
            status = chk.get("Status", "AVAILABLE")
            tries += 1
        if status not in ("AVAILABLE",):
            raise GlueCatalogError(
                f"schema version for {name!r} ended in status {status!r} "
                "— not usable for framing (incompatible evolution?)"
            )
        self._by_uuid[vid] = parsed
        return vid

    def schema_by_uuid(self, vid: bytes) -> dict:
        vid = bytes(vid)
        if vid not in self._by_uuid:
            import uuid as _uuid

            from flinkrunner_spark.serde.avro_codec import parse_schema

            out = self._call(
                "AWSGlue.GetSchemaVersion",
                json.dumps(
                    {"SchemaVersionId": str(_uuid.UUID(bytes=vid))}
                ).encode(),
            )
            self._by_uuid[vid] = parse_schema(out["SchemaDefinition"])
        return self._by_uuid[vid]

    def uuid_by_name(self, name: str) -> bytes:
        out = self._call(
            "AWSGlue.GetSchemaVersion",
            json.dumps(
                {
                    "SchemaId": {
                        "RegistryName": self.registry_name,
                        "SchemaName": name,
                    },
                    "SchemaVersionNumber": {"LatestVersion": True},
                }
            ).encode(),
        )
        vid = self._to_bytes(out["SchemaVersionId"])
        # the response already carries the definition — memoize it so a
        # cold decode pays one registry call, not two
        if vid not in self._by_uuid and out.get("SchemaDefinition"):
            from flinkrunner_spark.serde.avro_codec import parse_schema

            self._by_uuid[vid] = parse_schema(out["SchemaDefinition"])
        return vid


def glue_registry_from_conf(conf: dict):
    """Build a `GlueSchemaRegistry` from ``schema.registry.*`` sink conf
    — the aws_glue branch of the reference's SchemaRegistryConfig.
    Returns None unless both region and credentials are present (the
    caller can then raise its own contract error naming the right
    keys)."""
    if not (
        conf.get("schema.registry.region")
        and conf.get("schema.registry.aws.access.key.id")
    ):
        return None
    return GlueSchemaRegistry(
        {
            k.split("schema.registry.", 1)[1]: v
            for k, v in conf.items()
            if k.startswith("schema.registry.")
        }
    )
