"""Dynamic sink destination names — reference
`util/SinkDestinationNameUtils.scala` parity.

The reference expands ``<canonical-name>`` / ``<simple-name>`` tokens in
kafka topics, kinesis streams, file paths and elasticsearch indexes from
the value being serialized (avro schema full/short name, else the
runtime class name), normalizing kafka topic templates first (lowercase,
strip invalid characters, underscores → periods).

The Spark analog: a DataFrame is homogeneous, so the "value type" is the
frame's derived Avro record schema — expansion happens once per write
instead of per element. ``canonical``/``simple`` default from the
schema's namespace-qualified and short names; `expand_for_frame` derives
them from a DataFrame + optional record name the same way the sinks'
avro encoders do.
"""

from __future__ import annotations

import re

TOKEN_RE = re.compile(r"<([a-z\-]+)>")


def normalize_kafka_topic(template: str) -> str:
    """The reference's kafka topic normalization: lowercase, strip
    everything outside [<>a-z0-9._-] (token braces survive so
    ``<simple-name>`` still expands), underscores standardize to
    periods."""
    out = template.lower()
    out = re.sub(r"[^<>a-z\d._\-]", "", out)
    return out.replace("_", ".")


def expand_destination_template(
    template: str, canonical: str | None, simple: str | None
) -> str:
    """Expand ``<canonical-name>`` / ``<simple-name>`` tokens; None
    values expand to the literal "null" (the reference's null-value
    contract). Templates without both braces pass through untouched."""
    if not ("<" in template and ">" in template):
        return template
    values = {
        "canonical-name": canonical if canonical is not None else "null",
        "simple-name": simple if simple is not None else "null",
    }
    return TOKEN_RE.sub(
        lambda m: values.get(m.group(1), m.group(0)), template
    )


def expand_for_frame(
    template: str,
    df,
    record_name: str = "record",
    namespace: str | None = None,
    kafka: bool = False,
) -> str:
    """Expand a destination template from a DataFrame's derived record
    identity — `<simple-name>` = the record name, `<canonical-name>` =
    namespace-qualified (the avro full-name rule). With ``kafka=True``
    the template normalizes first, exactly like the reference's
    KafkaSinkConfig branch."""
    if kafka:
        template = normalize_kafka_topic(template)
    canonical = (
        f"{namespace}.{record_name}" if namespace else record_name
    )
    return expand_destination_template(template, canonical, record_name)
