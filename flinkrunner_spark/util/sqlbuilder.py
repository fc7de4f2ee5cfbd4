"""Dialect-aware SQL DDL builder — Spark analog of reference
util/SqlBuilder.scala + model/SupportedDatabase.scala (+ the auto
CREATE TABLE behavior of operator/CreateTableJdbcSinkFunction.scala).
"""

from __future__ import annotations

from pyspark.sql import types as T

DIALECTS = {
    "postgresql": {"quote": '"', "types": {}},
    "timescaledb": {"quote": '"', "types": {}},
    "mysql": {"quote": "`", "types": {"text": "TEXT"}},
    "sqlserver": {"quote": "[", "types": {"double precision": "FLOAT"}},
    "snowflake": {"quote": '"', "types": {}},
    # derby: the JDBC driver that ships with Spark — used to exercise the
    # real create-table + write + read-back flow without external services.
    # No IF NOT EXISTS; VARCHAR needs an explicit length.
    "derby": {
        "quote": '"',
        "types": {
            "varchar": "VARCHAR(4000)",
            "double precision": "DOUBLE",
            "bytea": "BLOB",
        },
        "if_not_exists": False,
    },
}

_SPARK_TO_SQL = {
    T.LongType(): "BIGINT",
    T.IntegerType(): "INTEGER",
    T.ShortType(): "SMALLINT",
    T.DoubleType(): "DOUBLE PRECISION",
    T.FloatType(): "REAL",
    T.StringType(): "VARCHAR",
    T.BooleanType(): "BOOLEAN",
    T.DateType(): "DATE",
    T.TimestampType(): "TIMESTAMP",
    T.BinaryType(): "BYTEA",
}


# Quoting surface of reference util/Quoting.scala (ofIdentifiers /
# ofLiterals), ENGINE-CORRECTED — a documented divergence, same
# precedent as the delivery.guarantee tightening: the reference's
# EscapeChar strategy backslash-escapes the closing quote, which the
# actual engines reject inside quoted IDENTIFIERS (PostgreSQL/MySQL
# both require quote-DOUBLING there; a backslash is literal), and its
# SqlServer strategy doubles the OPENING bracket while T-SQL needs the
# CLOSING ``]`` doubled. Every engine here accepts the SQL-standard
# rule — double the closing quote character — for identifiers AND
# string literals (MySQL allows '' alongside backslash escapes), so
# that single engine-proven rule is used throughout. Derby is exercised
# against the real bundled engine in tests.
_IDENT_QUOTES = {
    "postgresql": ('"', '"'),
    "timescaledb": ('"', '"'),
    "mysql": ("`", "`"),
    "snowflake": ('"', '"'),
    "sqlserver": ("[", "]"),
    "derby": ('"', '"'),
}


def quote_ident(name: str, dialect: str = "postgresql") -> str:
    start, end = _IDENT_QUOTES[dialect]
    return f"{start}{name.replace(end, end + end)}{end}"


# dialects whose string literals treat backslash as an ESCAPE character
# (MySQL default sql_mode, Snowflake): a backslash in the content must
# itself be escaped or a trailing '\' swallows the closing quote —
# unterminated literal, the classic backslash injection. PostgreSQL
# (standard_conforming_strings, the default since 9.1), SQL Server and
# Derby treat backslash as a literal character, where doubling it would
# CORRUPT the value instead.
_BACKSLASH_ESCAPING_LITERALS = frozenset({"mysql", "snowflake"})


def quote_literal(value: str, dialect: str = "postgresql") -> str:
    """String-literal quoting (reference Quoting.ofLiterals surface):
    single quotes, embedded quotes doubled ('' is valid on every
    supported engine), and backslashes doubled ONLY on the dialects
    that treat them as escapes."""
    if dialect not in _IDENT_QUOTES:
        raise KeyError(dialect)
    if dialect in _BACKSLASH_ESCAPING_LITERALS:
        value = value.replace("\\", "\\\\")
    return "'" + value.replace("'", "''") + "'"


def sql_type(dt: T.DataType, dialect: str = "postgresql") -> str:
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    base = _SPARK_TO_SQL.get(dt)
    if base is None:
        raise ValueError(f"no SQL mapping for Spark type {dt}")
    return DIALECTS[dialect]["types"].get(base.lower(), base)


def create_table_from_schema(
    table: str,
    schema: T.StructType,
    dialect: str = "postgresql",
    pk: list[str] | str | None = None,
) -> str:
    cols = [
        f"{quote_ident(f.name, dialect)} {sql_type(f.dataType, dialect)}"
        + ("" if f.nullable else " NOT NULL")
        for f in schema.fields
    ]
    if pk:
        pk = [pk] if isinstance(pk, str) else list(pk)
        cols.append(
            "PRIMARY KEY ("
            + ", ".join(quote_ident(c, dialect) for c in pk)
            + ")"
        )
    ine = "IF NOT EXISTS " if DIALECTS[dialect].get("if_not_exists", True) else ""
    return (
        f"CREATE TABLE {ine}{quote_ident(table, dialect)} (\n  "
        + ",\n  ".join(cols)
        + "\n)"
    )


def create_index(
    table: str,
    name: str,
    columns: list[str] | str,
    unique: bool = False,
    dialect: str = "postgresql",
) -> str:
    """CREATE [UNIQUE] INDEX DDL (reference `model/JdbcSinkIndex.scala`
    ``definition``): the index name is auto-prefixed with the table name
    (underscore-separated, the reference's convention), each column may
    carry an ``ASC``/``DESC`` suffix (default ASC)."""
    cols = [columns] if isinstance(columns, str) else list(columns)
    parts = []
    for c in cols:
        bits = c.split(None, 1)
        order = bits[1].upper() if len(bits) > 1 else "ASC"
        if order not in ("ASC", "DESC"):
            raise ValueError(f"bad index column order {bits[1]!r} in {c!r}")
        parts.append(f"{quote_ident(bits[0], dialect)} {order}")
    return (
        "CREATE "
        + ("UNIQUE " if unique else "")
        + f"INDEX {quote_ident(f'{table}_{name}', dialect)} ON "
        + quote_ident(table, dialect)
        + " ("
        + ", ".join(parts)
        + ")"
    )


def create_table_from_columns(
    table: str,
    columns: list[dict],
    dialect: str = "postgresql",
    pk: list[str] | str | None = None,
) -> str:
    """CREATE TABLE from the reference's explicit ``table.columns``
    config (JdbcSinkConfig.scala: name/type/precision/scale/nullable) —
    the escape hatch for types the frame schema cannot express (fixed
    CHAR widths, DECIMAL scales, database-tuned text types). ``type`` is
    the JDBC standard type name; precision/scale render as the usual
    parenthesized suffix."""
    cols = []
    for c in columns:
        t = str(c["type"]).upper()
        if c.get("precision") is not None:
            t += f"({c['precision']}"
            if c.get("scale") is not None:
                t += f", {c['scale']}"
            t += ")"
        cols.append(
            f"{quote_ident(c['name'], dialect)} {t}"
            + ("" if c.get("nullable", True) else " NOT NULL")
        )
    if pk:
        pk = [pk] if isinstance(pk, str) else list(pk)
        cols.append(
            "PRIMARY KEY ("
            + ", ".join(quote_ident(c, dialect) for c in pk)
            + ")"
        )
    ine = "IF NOT EXISTS " if DIALECTS[dialect].get("if_not_exists", True) else ""
    return (
        f"CREATE TABLE {ine}{quote_ident(table, dialect)} (\n  "
        + ",\n  ".join(cols)
        + "\n)"
    )
