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
