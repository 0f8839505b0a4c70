"""MySQL → Spark SQL dialect shim for metadata-stored expressions.

The reference stores *free-form MySQL expressions* in metadata
(``TransformationLogic`` / ``IncrementalFilter`` / ``AdditionalTransform``,
``1. Metadata Creation.sql:67,94,132``) and lets MySQL evaluate them at
runtime. This engine evaluates them in Spark SQL instead, so expressions in
the supported MySQL subset are translated token-wise and **validated at
compile time** (parse with ``F.expr``; fail fast per column — the reference
only fails at runtime inside MySQL).

Supported subset (documented contract):
- ANSI passthrough: CASE/WHEN, CONCAT, TRIM, UPPER/LOWER, SUBSTRING,
  COALESCE, arithmetic, comparison, IS NULL, AND/OR/NOT, IN, LIKE, CAST.
- MySQL-isms translated: IF→if (same in Spark), IFNULL→ifnull (same),
  NOW()→current_timestamp(), CURDATE()→current_date(),
  DATE_FORMAT tokens %Y %y %m %d %H %i %s %b %M→Spark datetime pattern,
  backtick identifiers → unquoted, RAND()→rand(), LENGTH→length.
- Rejected (raise): GROUP_CONCAT in scalar position (aggregate — belongs to
  the compiler's ordered-concat, SURVEY §2.4 A1), LAST_INSERT_ID (engine
  allocates ids, SURVEY §2.8 L1).
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

_DATE_FORMAT_TOKENS = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%c": "M",
    "%d": "dd",
    "%e": "d",
    "%H": "HH",
    "%k": "H",
    "%i": "mm",
    "%s": "ss",
    "%S": "ss",
    "%b": "MMM",
    "%M": "MMMM",
    "%a": "EEE",
    "%W": "EEEE",
    "%j": "DDD",
    "%p": "a",
    "%f": "SSSSSS",
}

_REJECTED = re.compile(r"\b(GROUP_CONCAT|LAST_INSERT_ID)\s*\(", re.IGNORECASE)

_SIMPLE_FN_RENAMES = {
    "NOW": "current_timestamp",
    "CURDATE": "current_date",
    "UTC_TIMESTAMP": "current_timestamp",
    "RAND": "rand",
    "LCASE": "lower",
    "UCASE": "upper",
}


class DialectError(ValueError):
    """Raised when a metadata expression uses an unsupported MySQL feature
    or fails to parse after translation."""


def _translate_date_format_literals(sql: str) -> str:
    """Rewrite the %-token format string in DATE_FORMAT(x, '...') calls."""

    def repl(m: re.Match) -> str:
        fmt = m.group(2)
        for tok, spark_tok in _DATE_FORMAT_TOKENS.items():
            fmt = fmt.replace(tok, spark_tok)
        return f"date_format({m.group(1)},'{fmt}')"

    return re.sub(
        r"DATE_FORMAT\s*\(\s*(.+?)\s*,\s*'([^']*)'\s*\)",
        repl,
        sql,
        flags=re.IGNORECASE,
    )


def _translate_str_to_date_literals(sql: str) -> str:
    """Rewrite STR_TO_DATE(x, '%-tokens') — DATE_FORMAT's parsing twin —
    into ``to_timestamp(x, 'spark-tokens')`` with the same token map."""

    def repl(m: re.Match) -> str:
        fmt = m.group(2)
        for tok, spark_tok in _DATE_FORMAT_TOKENS.items():
            fmt = fmt.replace(tok, spark_tok)
        return f"to_timestamp({m.group(1)},'{fmt}')"

    return re.sub(
        r"STR_TO_DATE\s*\(\s*(.+?)\s*,\s*'([^']*)'\s*\)",
        repl,
        sql,
        flags=re.IGNORECASE,
    )


def translate(expr_sql: str) -> str:
    """Translate one MySQL scalar expression to Spark SQL. Raises
    :class:`DialectError` on rejected constructs."""
    if _REJECTED.search(expr_sql):
        raise DialectError(
            f"unsupported MySQL construct in metadata expression: {expr_sql!r}"
        )
    out = expr_sql.replace("`", "")
    out = _translate_date_format_literals(out)
    out = _translate_str_to_date_literals(out)
    for mysql_fn, spark_fn in _SIMPLE_FN_RENAMES.items():
        out = re.sub(rf"\b{mysql_fn}\s*\(", f"{spark_fn}(", out, flags=re.IGNORECASE)
    return out


def validate(expr_sql: str) -> str:
    """Translate AND parse-check an expression; returns the Spark SQL form.

    Compile-time fail-fast: a bad metadata expression is reported with the
    offending text instead of failing mid-extraction.
    """
    translated = translate(expr_sql)
    # F.expr is lazy in PySpark 4 (no parse until analysis), so drive the
    # session's SQL parser directly for an eager parse-only check.
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is not None:
        try:
            spark._jsparkSession.sessionState().sqlParser().parseExpression(translated)
        except Exception as exc:
            raise DialectError(
                f"metadata expression does not parse as Spark SQL: {expr_sql!r} "
                f"(translated: {translated!r}): {exc.__class__.__name__}"
            ) from exc
    else:  # no session (pure unit context): defer to first use
        F.expr(translated)
    return translated
