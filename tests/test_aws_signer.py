"""SigV4 signer: validated against the worked example in the AWS General
Reference "Signature Version 4 signing process" documentation (the
AKIDEXAMPLE ListUsers request on iam, 2015-08-30), plus behavioral checks
mirroring the reference's AWSSigner (service inference, s3 content-hash
header)."""

from __future__ import annotations

from flinkrunner_spark.util.aws_signer import (
    AwsCredentials,
    resolve_service,
    sign_request,
)

CREDS = AwsCredentials(
    access_key="AKIDEXAMPLE",
    secret_key="wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
)


def test_documented_iam_example_vector():
    """The AWS-documented GET ListUsers example: the published expected
    signature is 5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7."""
    out = sign_request(
        method="GET",
        url="https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08",
        headers={
            "Content-Type": "application/x-www-form-urlencoded; charset=utf-8",
        },
        payload=b"",
        credentials=CREDS,
        region="us-east-1",
        amz_date="20150830T123600Z",
    )
    from flinkrunner_spark.util.aws_signer import signing_key

    # documented intermediates from the same worked example
    assert (
        signing_key(CREDS.secret_key, "20150830", "us-east-1", "iam").hex()
        == "c4afb1cc5771d871763a393e44b703571b55cc28424d1a5e86da6ed3c154a4b9"
    )
    auth = out["authorization"]
    assert auth.startswith(
        "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/iam/"
        "aws4_request, SignedHeaders=content-type;host;x-amz-date, Signature="
    )
    assert auth.endswith(
        "5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7"
    )


def test_service_inference_matches_reference_pattern():
    assert resolve_service("iam.amazonaws.com") == "iam"
    assert resolve_service("kinesis.us-west-2.amazonaws.com") == "kinesis"
    assert resolve_service("firehose.eu-west-1.amazonaws.com") == "firehose"
    assert resolve_service("example.org") is None


def test_s3_gets_content_sha_and_single_encoding():
    out = sign_request(
        method="PUT",
        url="https://mybucket.s3.amazonaws.com/path with space/key",
        headers={},
        payload=b"hello",
        credentials=CREDS,
        region="us-east-1",
        amz_date="20150830T123600Z",
        service="s3",
    )
    import hashlib

    assert out["x-amz-content-sha256"] == hashlib.sha256(b"hello").hexdigest()
    assert "x-amz-content-sha256" in out["authorization"]


def test_session_token_is_signed():
    creds = AwsCredentials("AK", "SK", session_token="TOK")
    out = sign_request(
        method="POST",
        url="https://kinesis.us-east-1.amazonaws.com/",
        headers={"Content-Type": "application/x-amz-json-1.1"},
        payload=b"{}",
        credentials=creds,
        region="us-east-1",
        amz_date="20240101T000000Z",
    )
    assert out["x-amz-security-token"] == "TOK"
    assert "x-amz-security-token" in out["authorization"]


def test_signature_changes_with_inputs():
    base = dict(
        method="GET",
        url="https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08",
        headers={"Content-Type": "application/x-www-form-urlencoded; charset=utf-8"},
        payload=b"",
        credentials=CREDS,
        region="us-east-1",
        amz_date="20150830T123600Z",
    )
    sig = lambda o: o["authorization"].rsplit("Signature=", 1)[1]  # noqa: E731
    ref = sig(sign_request(**base))
    assert sig(sign_request(**{**base, "amz_date": "20150830T123601Z"})) != ref
    assert sig(sign_request(**{**base, "region": "us-west-2"})) != ref
    assert sig(sign_request(**{**base, "payload": b"x"})) != ref


def test_kinesis_batching_and_request_shape(spark):
    """Kinesis PutRecords prep: batches respect count and byte limits,
    bodies are valid API payloads, headers sign correctly — all offline
    (reference KinesisSinkConfig's max.batch.size knobs)."""
    import base64
    import json

    from flinkrunner_spark.sinks.factory import (
        FirehoseSinkConfig,
        KinesisSinkConfig,
    )

    df = spark.createDataFrame(
        [(i, f"ev{i}", float(i)) for i in range(25)],
        "event_id long, event_type string, value double",
    )
    sink = KinesisSinkConfig(
        "events-stream",
        {
            "connector": "kinesis",
            "key.column": "event_id",
            "max.batch.size.in.number": 10,
        },
    )
    batches = sink.prepare_batches(df.coalesce(1)).collect()
    assert [b["n_records"] for b in batches] == [10, 10, 5]
    body = json.loads(batches[0]["body"])
    assert body["StreamName"] == "events-stream"
    rec = body["Records"][0]
    assert set(rec) == {"Data", "PartitionKey"}
    decoded = json.loads(base64.b64decode(rec["Data"]))
    assert set(decoded) == {"event_id", "event_type", "value"}
    assert rec["PartitionKey"] == str(decoded["event_id"])

    # byte-limit path: tiny cap forces one record per batch
    tiny = KinesisSinkConfig(
        "s", {"connector": "kinesis", "max.batch.size.in.bytes": 10}
    )
    nb = tiny.prepare_batches(df.coalesce(1)).collect()
    assert all(b["n_records"] == 1 for b in nb) and len(nb) == 25

    hdrs = sink.signed_headers(
        batches[0]["body"].encode(), "20240101T000000Z"
    )
    assert hdrs["x-amz-target"] == "Kinesis_20131202.PutRecords"
    assert "Credential=/20240101/us-east-1/kinesis/aws4_request" in hdrs[
        "authorization"
    ]

    # firehose: same machinery, PutRecordBatch shape, no partition keys
    fh = FirehoseSinkConfig("d-stream", {"connector": "firehose"})
    fb = json.loads(fh.prepare_batches(df.coalesce(1)).first()["body"])
    assert fb["DeliveryStreamName"] == "d-stream"
    assert set(fb["Records"][0]) == {"Data"}

    # posting without credentials raises the honest gate
    import pytest

    with pytest.raises(NotImplementedError, match="credentials"):
        sink.write(df)
