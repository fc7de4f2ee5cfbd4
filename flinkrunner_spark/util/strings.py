"""Small string/time utilities — parity with reference util/StringUtils.scala
(snakify, clean) and util/InstantUtils.scala (prefixedTimePath, the
/yyyy/MM/dd/HH layout used for time-partitioned file-sink paths).
"""

from __future__ import annotations

import re
from datetime import datetime, timezone


def snakify(name: str) -> str:
    """CamelCase / kebab-case / spaced → snake_case."""
    s = re.sub(r"[\s\-.]+", "_", name.strip())
    s = re.sub(r"(.)([A-Z][a-z]+)", r"\1_\2", s)
    s = re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", s)
    return re.sub(r"__+", "_", s).lower()


def clean(s: str, keep: str = "a-zA-Z0-9_", replacement: str = "") -> str:
    """Strip characters outside ``keep`` (a regex character class body)."""
    return re.sub(f"[^{keep}]", replacement, s)


def prefixed_time_path(prefix: str, instant: datetime | float) -> str:
    """``prefix/yyyy/MM/dd/HH`` in UTC — the reference's bucketing path
    layout for time-partitioned file sinks."""
    if isinstance(instant, (int, float)):
        instant = datetime.fromtimestamp(instant, tz=timezone.utc)
    elif instant.tzinfo is None:
        instant = instant.replace(tzinfo=timezone.utc)
    else:
        instant = instant.astimezone(timezone.utc)
    return prefix + instant.strftime("/%Y/%m/%d/%H")
