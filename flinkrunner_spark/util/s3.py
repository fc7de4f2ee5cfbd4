"""Jar-free S3 REST client (SigV4 via ``util/aws_signer``) — the
object-store transport for Iceberg tables whose warehouse lives in S3.

Reference scope: the reference reaches object storage through
hadoop-aws / iceberg-aws FileIO on the JVM (`IcebergCommonConfig.scala`
catalog wiring); this is the same jar-free wire-protocol discipline as
`util/kafka.py` / `util/cql.py` — the public S3 REST API implemented
directly (GetObject / PutObject / DeleteObject / ListObjectsV2 with
continuation paging), path-style addressing so localstack-style
endpoint overrides and the in-process loopback both work, request
construction offline-testable.

Scale note: this client serves the Iceberg METADATA plane and the
bounded table-mirror fallback (`s3_fileio.py`). At 100 TB the DATA
plane belongs to the s3a connector on the executors' JVM — a Python
byte pump through the driver is the wrong tool, and `s3_fileio`'s
mirror enforces an explicit size budget for exactly that reason.
"""

from __future__ import annotations

import urllib.error
import urllib.request
from datetime import datetime, timezone
from urllib.parse import quote


class S3Error(RuntimeError):
    def __init__(self, status: int, body: str):
        super().__init__(f"s3 error {status}: {body[:300]}")
        self.status = status


class S3Client:
    def __init__(
        self,
        endpoint: str,
        region: str = "us-east-1",
        access_key: str = "",
        secret_key: str = "",
        session_token: str | None = None,
    ):
        self.endpoint = endpoint.rstrip("/")
        self.region = region
        self.access_key = access_key
        self.secret_key = secret_key
        self.session_token = session_token

    # -- request builders (offline-testable) --------------------------------

    def object_url(self, bucket: str, key: str) -> str:
        # path-style: endpoint/bucket/key — works against loopback and
        # localstack-style overrides without virtual-host DNS
        return f"{self.endpoint}/{bucket}/{quote(key, safe='/~._-')}"

    def list_url(
        self, bucket: str, prefix: str, token: str | None = None
    ) -> str:
        q = f"list-type=2&prefix={quote(prefix, safe='')}"
        if token:
            q += f"&continuation-token={quote(token, safe='')}"
        return f"{self.endpoint}/{bucket}?{q}"

    # -- transport -----------------------------------------------------------

    def _call(
        self, method: str, url: str, body: bytes = b""
    ) -> tuple[int, bytes]:
        from flinkrunner_spark.util.aws_signer import (
            AwsCredentials,
            sign_request,
        )

        amz = datetime.now(timezone.utc).strftime("%Y%m%dT%H%M%SZ")
        headers = sign_request(
            method=method,
            url=url,
            headers={},
            payload=body,
            credentials=AwsCredentials(
                self.access_key, self.secret_key, self.session_token
            ),
            region=self.region,
            amz_date=amz,
            service="s3",
        )
        req = urllib.request.Request(
            url, data=body if method in ("PUT", "POST") else None,
            headers=headers, method=method,
        )
        try:
            with urllib.request.urlopen(req, timeout=60) as r:
                return r.status, r.read()
        except urllib.error.HTTPError as e:
            raise S3Error(e.code, e.read().decode("utf-8", "replace"))

    # -- operations ----------------------------------------------------------

    def get_object(self, bucket: str, key: str) -> bytes:
        _, body = self._call("GET", self.object_url(bucket, key))
        return body

    def put_object(self, bucket: str, key: str, data: bytes) -> None:
        self._call("PUT", self.object_url(bucket, key), data)

    def delete_object(self, bucket: str, key: str) -> None:
        self._call("DELETE", self.object_url(bucket, key))

    def list_objects(self, bucket: str, prefix: str) -> list[dict]:
        """Every object under ``prefix`` as {key, size} — ListObjectsV2
        with continuation paging (1000-key pages, the API contract)."""
        import re

        out: list[dict] = []
        token: str | None = None
        while True:
            _, body = self._call(
                "GET", self.list_url(bucket, prefix, token)
            )
            text = body.decode("utf-8", "replace")
            for m in re.finditer(
                r"<Contents>.*?<Key>(.*?)</Key>.*?<Size>(\d+)</Size>.*?"
                r"</Contents>",
                text,
                re.S,
            ):
                out.append({"key": _xml_unescape(m.group(1)),
                            "size": int(m.group(2))})
            t = re.search(
                r"<NextContinuationToken>(.*?)</NextContinuationToken>", text
            )
            truncated = re.search(r"<IsTruncated>true</IsTruncated>", text)
            if truncated and t:
                token = _xml_unescape(t.group(1))
            else:
                return out


def _xml_unescape(s: str) -> str:
    return (
        s.replace("&lt;", "<")
        .replace("&gt;", ">")
        .replace("&quot;", '"')
        .replace("&apos;", "'")
        .replace("&amp;", "&")
    )


def parse_s3_uri(uri: str) -> tuple[str, str]:
    """s3://bucket/key/prefix -> (bucket, key_prefix)."""
    if not uri.startswith("s3://"):
        raise ValueError(f"not an s3 uri: {uri!r}")
    rest = uri[len("s3://"):]
    bucket, _, key = rest.partition("/")
    if not bucket:
        raise ValueError(f"s3 uri missing bucket: {uri!r}")
    return bucket, key
