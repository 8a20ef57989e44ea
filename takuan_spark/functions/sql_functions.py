"""SQL scalar UDF definitions mirroring the Column helpers.

Kept as data (name → CREATE statement) so tests can iterate the whole
surface and docs can render it."""

from __future__ import annotations

#: name → (signature, return type, body) — bodies are Spark SQL
#: expressions, formula-identical to the Column builders cited.
SQL_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    # operators/text.py:word_count
    "takuan_word_count": (
        "(s STRING)",
        "INT",
        r"size(filter(split(s, '\\s+'), x -> x != ''))",
    ),
    # operators/text.py:token_count (BPE-ish: word pieces + punctuation)
    "takuan_token_count": (
        "(s STRING)",
        "INT",
        r"size(regexp_extract_all(s, '[A-Za-z0-9_]+|[^\\sA-Za-z0-9_]', 0))",
    ),
    # operators/text.py:punct_ratio
    "takuan_punct_ratio": (
        "(s STRING)",
        "DOUBLE",
        r"""CASE WHEN length(regexp_replace(s, '\\s+', '')) > 0
             THEN length(regexp_replace(s, '[\\sA-Za-z0-9_]+', ''))
                  / length(regexp_replace(s, '\\s+', ''))
             ELSE 0.0 END""",
    ),
    # operators/text.py:code_likeness
    "takuan_code_frac": (
        "(s STRING)",
        "DOUBLE",
        r"""CASE WHEN length(s) > 0
             THEN (length(s) - length(regexp_replace(s,
                      '[{}()\\[\\];=<>#_]', ''))) / length(s)
             ELSE 0.0 END""",
    ),
    # operators/text.py:fingerprint (md5 of normalized text)
    "takuan_fingerprint": (
        "(s STRING)",
        "STRING",
        r"md5(trim(regexp_replace(lower(s), '\\s+', ' ')))",
    ),
    # operators/web.py:url_host
    "takuan_url_host": (
        "(s STRING)",
        "STRING",
        r"regexp_extract(s, '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1)",
    ),
    # operators/enrich.py:ip_to_long
    "takuan_ip_to_long": (
        "(s STRING)",
        "BIGINT",
        r"""aggregate(transform(split(s, '\\.'), o -> CAST(o AS BIGINT)),
                      CAST(0 AS BIGINT), (acc, o) -> acc * 256 + o)""",
    ),
    # operators/hashing.py:md5_int(hex_chars=15)
    "takuan_md5_int60": (
        "(s STRING)",
        "BIGINT",
        "CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)",
    ),
}


def register_sql_functions(spark) -> list[str]:
    """Register every function as a TEMPORARY SQL UDF on ``spark``'s
    session catalog; returns the registered names. Idempotent
    (CREATE OR REPLACE)."""
    for name, (sig, ret, body) in SQL_FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} "
            f"RETURNS {ret} RETURN {body}"
        )
    return list(SQL_FUNCTIONS)
