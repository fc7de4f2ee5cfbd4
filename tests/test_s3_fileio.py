"""S3 FileIO (r7 verdict missing-item 4): the jar-free S3 REST client,
table publishing with internal-path rewriting (the rewrite_table_path +
copy procedure), and the mirror-to-cache read path with path_mapping —
all against the loopback S3 endpoint speaking the genuine wire shapes."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flinkrunner_spark import s3_fileio  # noqa: E402
from flinkrunner_spark.iceberg import IcebergFsTable  # noqa: E402
from flinkrunner_spark.testing import LoopbackS3  # noqa: E402
from flinkrunner_spark.util.s3 import S3Client, S3Error, parse_s3_uri  # noqa: E402


def _client(s3: LoopbackS3) -> S3Client:
    return S3Client(s3.endpoint, access_key="k", secret_key="s")


def test_parse_s3_uri():
    assert parse_s3_uri("s3://bkt/a/b") == ("bkt", "a/b")
    assert parse_s3_uri("s3://bkt") == ("bkt", "")
    with pytest.raises(ValueError):
        parse_s3_uri("file:///x")
    with pytest.raises(ValueError):
        parse_s3_uri("s3://")


def test_s3_client_put_get_list_delete_roundtrip():
    with LoopbackS3() as s3:
        c = _client(s3)
        c.put_object("b", "w/t/one.bin", b"\x00\x01data")
        c.put_object("b", "w/t/two.txt", b"hello")
        c.put_object("b", "other/x", b"x")
        assert c.get_object("b", "w/t/one.bin") == b"\x00\x01data"
        keys = c.list_objects("b", "w/t/")
        assert [(o["key"], o["size"]) for o in keys] == [
            ("w/t/one.bin", 6), ("w/t/two.txt", 5)
        ]
        c.delete_object("b", "w/t/two.txt")
        assert [o["key"] for o in c.list_objects("b", "w/")] == ["w/t/one.bin"]
        with pytest.raises(S3Error) as ei:
            c.get_object("b", "w/t/two.txt")
        assert ei.value.status == 404


def test_s3_list_paginates_with_continuation():
    with LoopbackS3() as s3:
        s3.PAGE = 3  # shrink the page to force continuation tokens
        c = _client(s3)
        for i in range(10):
            c.put_object("b", f"p/k{i:02d}", b"v" * i)
        out = c.list_objects("b", "p/")
        assert [o["key"] for o in out] == [f"p/k{i:02d}" for i in range(10)]
        assert [o["size"] for o in out] == list(range(10))


def test_s3_requires_sigv4():
    import urllib.error
    import urllib.request

    with LoopbackS3() as s3:
        req = urllib.request.Request(f"{s3.endpoint}/b/k", method="GET")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 403


def test_s3_loopback_verifies_signature():
    """The loopback recomputes the SigV4 signature from the wire bytes:
    wrong secret → 403 SignatureDoesNotMatch, wrong access key → 403
    AccessDenied, tampered payload hash → 400. Guards against the class
    of bug where client-side canonicalization drifts from the service's
    (e.g. double-encoding the list prefix) but presence-only auth checks
    let it pass."""
    with LoopbackS3() as s3:
        bad_secret = S3Client(s3.endpoint, access_key="k", secret_key="WRONG")
        with pytest.raises(S3Error) as ei:
            bad_secret.put_object("b", "k", b"v")
        assert ei.value.status == 403
        assert "SignatureDoesNotMatch" in str(ei.value)
        bad_akid = S3Client(s3.endpoint, access_key="WHO", secret_key="s")
        with pytest.raises(S3Error) as ei:
            bad_akid.get_object("b", "k")
        assert ei.value.status == 403


def test_s3_list_prefix_with_slashes_signs_correctly():
    """Regression for the double-encoding bug: ListObjectsV2 prefixes
    always contain '/' (ns/table/metadata/), which the URL builder must
    percent-encode on the wire; the signer must canonicalize the DECODED
    value (prefix=ns%2Fdocs), not re-encode the wire form (ns%252Fdocs).
    The verifying loopback fails the old behavior with
    SignatureDoesNotMatch."""
    with LoopbackS3() as s3:
        c = _client(s3)
        c.put_object("b", "ns/docs/metadata/v1.json", b"{}")
        c.put_object("b", "ns/docs/data/f1.parquet", b"pq")
        c.put_object("b", "ns/other/x", b"x")
        got = [o["key"] for o in c.list_objects("b", "ns/docs/")]
        assert got == ["ns/docs/data/f1.parquet", "ns/docs/metadata/v1.json"]


def test_s3_key_with_special_chars_roundtrip():
    """Keys with spaces/'+'/unicode must sign and roundtrip: the wire
    path is percent-encoded once and the canonical path is the decoded
    path re-encoded once (no double encoding)."""
    with LoopbackS3() as s3:
        c = _client(s3)
        key = "ns/tbl/part=a b+c/f-1.parquet"
        c.put_object("b", key, b"payload")
        assert c.get_object("b", key) == b"payload"
        assert [o["key"] for o in c.list_objects("b", "ns/tbl/")] == [key]


def _docs_table(spark, tmp_path, name="t1"):
    t = IcebergFsTable(str(tmp_path / name))
    df = spark.createDataFrame(
        [(i, f"text-{i}", "en" if i % 2 else "de") for i in range(40)],
        "doc_id long, text string, lang string",
    )
    t.append(df)
    return t


def test_upload_and_mirror_roundtrip(spark, tmp_path):
    """Publish → mirror → identical rows; the mirrored table is
    read-only; the uploaded objects are a genuinely S3-native table
    (every internal path starts with the s3 root)."""
    t = _docs_table(spark, tmp_path)
    with LoopbackS3() as s3:
        c = _client(s3)
        n = s3_fileio.upload_table(t, c, "s3://wh/ns/t1")
        assert n >= 4  # data + metadata.json + manifest list + manifest + hint
        # the published metadata is self-consistently s3-rooted
        import json as _json

        md = _json.loads(c.get_object("wh", "ns/t1/metadata/v1.metadata.json"))
        assert md["location"].startswith("s3://wh/ns/t1")
        for snap in md["snapshots"]:
            assert snap["manifest-list"].startswith("s3://wh/ns/t1/")

        m = s3_fileio.open_s3_table(
            "s3://wh/ns/t1", c, str(tmp_path / "cache")
        )
        got = sorted(
            (r["doc_id"], r["text"], r["lang"])
            for r in m.read(spark).collect()
        )
        want = sorted(
            (r["doc_id"], r["text"], r["lang"])
            for r in t.read(spark).collect()
        )
        assert got == want and len(got) == 40
        with pytest.raises(ValueError, match="read-only"):
            m.append(spark.createDataFrame([(99, "x", "en")], t.read(spark).schema))
        with pytest.raises(ValueError, match="read-only"):
            m.expire_snapshots()
        with pytest.raises(ValueError, match="read-only"):
            m.remove_orphan_files()


def test_mirror_follows_new_commits_incrementally(spark, tmp_path):
    t = _docs_table(spark, tmp_path)
    with LoopbackS3() as s3:
        c = _client(s3)
        s3_fileio.upload_table(t, c, "s3://wh/ns/t1")
        cache = str(tmp_path / "cache")
        m1 = s3_fileio.open_s3_table("s3://wh/ns/t1", c, cache)
        assert m1.read(spark).count() == 40
        t.append(
            spark.createDataFrame(
                [(100, "late", "fr")], "doc_id long, text string, lang string"
            )
        )
        s3_fileio.upload_table(t, c, "s3://wh/ns/t1")
        m2 = s3_fileio.open_s3_table("s3://wh/ns/t1", c, cache)
        rows = m2.read(spark).collect()
        assert len(rows) == 41
        assert any(r["lang"] == "fr" for r in rows)


def test_mirror_applies_position_deletes_across_relocation(spark, tmp_path):
    """delete_where writes position-delete rows NAMING data files by
    absolute path; upload rewrites those VALUES to s3:// and the mirror
    maps them back — a dropped mapping would silently resurrect deleted
    rows, so this is the load-bearing case."""
    t = _docs_table(spark, tmp_path)
    n_del = t.delete_where(spark, "doc_id % 4 = 0")
    assert n_del == 10
    with LoopbackS3() as s3:
        c = _client(s3)
        s3_fileio.upload_table(t, c, "s3://wh/ns/t1")
        m = s3_fileio.open_s3_table("s3://wh/ns/t1", c, str(tmp_path / "cc"))
        got = sorted(r["doc_id"] for r in m.read(spark).collect())
        assert got == sorted(
            i for i in range(40) if i % 4 != 0
        )


def test_uploaded_manifest_lengths_match_rewritten_blobs(spark, tmp_path):
    """Manifests are re-encoded on upload (paths grow to s3:// form), so
    every manifest-list row's manifest_length must be refreshed to the
    REWRITTEN blob's size — a reader that trusts manifest_length (the
    jar does, for read-ahead) must never see the stale local size."""
    from flinkrunner_spark.serde import avro_codec as AC

    t = _docs_table(spark, tmp_path)
    t.delete_where(spark, "doc_id % 5 = 0")  # adds a delete manifest too
    with LoopbackS3() as s3:
        c = _client(s3)
        s3_fileio.upload_table(t, c, "s3://wh/ns/t1")
        checked = 0
        for o in c.list_objects("wh", "ns/t1/metadata/"):
            name = o["key"].rsplit("/", 1)[-1]
            if not (name.startswith("snap-") and name.endswith(".avro")):
                continue
            _, rows = AC.read_container(c.get_object("wh", o["key"]))
            for r in rows:
                mpath = r["manifest_path"]
                assert mpath.startswith("s3://wh/ns/t1/")
                blob = c.get_object("wh", mpath[len("s3://wh/"):])
                assert r["manifest_length"] == len(blob), mpath
                checked += 1
        assert checked >= 2  # data + delete manifests at minimum


def test_mirror_budget_refuses_oversize(spark, tmp_path):
    t = _docs_table(spark, tmp_path)
    with LoopbackS3() as s3:
        c = _client(s3)
        s3_fileio.upload_table(t, c, "s3://wh/ns/t1")
        with pytest.raises(ValueError, match="mirror budget"):
            s3_fileio.open_s3_table(
                "s3://wh/ns/t1", c, str(tmp_path / "cb"), max_bytes=10
            )
        with pytest.raises(FileNotFoundError):
            s3_fileio.open_s3_table(
                "s3://wh/ns/ghost", c, str(tmp_path / "cg")
            )
