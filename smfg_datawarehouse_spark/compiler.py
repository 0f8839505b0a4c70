"""Metadata → plan compiler.

Re-expresses the reference's 5-CTE compiler query
(``source_code/sql/Staging_Extraction_Metadata_Query.sql:1-57``) in two
forms:

1. :func:`compile_extraction_queries` — the *string* form: a DataFrame of
   ``(TableID, FullTableName, DataExtractQuery)``, byte-compatible with the
   reference's output (same fallback semantics: NULL/whitespace-only
   ``TransformationLogic`` → bare column, NULL ``AliasName`` → column name,
   WHERE appended only for ``LoadType='INCREMENTAL' AND IncrementalFilter
   IS NOT NULL``). Built with DataFrame ops + the deterministic ordered
   concat (SURVEY §2.4 A1) — no ``group_concat_max_len`` cap to work around.

2. :func:`compile_extraction_plans` — the *structural* form: per-table
   :class:`ExtractionPlan` holding ``(expr, alias)`` pairs + optional filter,
   dialect-translated and parse-validated, applied to a DataFrame with
   ``selectExpr``-style Columns so Catalyst sees a declarative plan
   (projection/predicate pushdown for free, SURVEY §4).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from smfg_datawarehouse_spark import dialect
from smfg_datawarehouse_spark.catalog import ConfigCatalog
from smfg_datawarehouse_spark.functions import ordered_concat_ws


def _modified_column_expr() -> Column:
    """The columnDetail CTE's ``modifiedColumns`` synthesis
    (``Staging_Extraction_Metadata_Query.sql:20-27``)."""
    logic = F.col("TransformationLogic")
    use_logic = logic.isNotNull() & (F.trim(logic) != "")
    source = F.when(use_logic, logic).otherwise(F.col("ColumnName"))
    alias = F.coalesce(F.col("AliasName"), F.col("ColumnName"))
    return F.concat(source, F.lit(" AS "), alias)


def compile_extraction_queries(catalog: ConfigCatalog) -> DataFrame:
    """(TableID, FullTableName, DataExtractQuery) — string-form compile."""
    table_detail = catalog.active_tables().select(
        "TableID", "SchemaName", "TableName", "LoadType", "IncrementalFilter"
    )
    column_detail = (
        table_detail.join(catalog.column_config, "TableID")
        .where(F.col("IncludeFlag"))
        .select(
            "TableID",
            "SchemaName",
            "TableName",
            "ColumnID",
            _modified_column_expr().alias("modifiedColumns"),
        )
    )
    final_column_list = column_detail.groupBy(
        "TableID",
        F.concat_ws(".", F.col("SchemaName"), F.col("TableName")).alias("FullTableName"),
    ).agg(
        ordered_concat_ws(", ", "ColumnID", "modifiedColumns").alias("FinalColumns")
    )
    where_clause = F.when(
        (F.col("LoadType") == "INCREMENTAL") & F.col("IncrementalFilter").isNotNull(),
        F.concat(F.lit(" WHERE "), F.col("IncrementalFilter")),
    ).otherwise(F.lit(""))
    return (
        final_column_list.join(F.broadcast(table_detail), "TableID")
        .select(
            "TableID",
            "FullTableName",
            F.concat(
                F.lit("SELECT "),
                F.col("FinalColumns"),
                F.lit(" FROM "),
                F.col("FullTableName"),
                where_clause,
            ).alias("DataExtractQuery"),
        )
    )


@dataclass
class ExtractionPlan:
    """Structural twin of one DataExtractQuery."""

    table_id: int
    schema_name: str
    table_name: str
    load_type: str
    projections: list[tuple[str, str]] = field(default_factory=list)  # (spark_sql_expr, alias)
    filter_sql: str | None = None  # Spark SQL predicate (dialect-translated)

    @property
    def full_table_name(self) -> str:
        return f"{self.schema_name}.{self.table_name}"

    def columns(self) -> list[Column]:
        return [F.expr(expr).alias(alias) for expr, alias in self.projections]

    def apply(self, df: DataFrame) -> DataFrame:
        """Execute the plan against a source DataFrame. Filter first (on
        source columns, Catalyst pushes it into the scan), then project."""
        out = df
        if self.filter_sql:
            out = out.where(F.expr(self.filter_sql))
        return out.select(*self.columns())

    def to_sql(self, from_clause: str | None = None) -> str:
        cols = ", ".join(f"{expr} AS {alias}" for expr, alias in self.projections)
        sql = f"SELECT {cols} FROM {from_clause or self.full_table_name}"
        if self.filter_sql:
            sql += f" WHERE {self.filter_sql}"
        return sql


def compile_extraction_plans(catalog: ConfigCatalog) -> list[ExtractionPlan]:
    """Structural compile: active tables → validated ExtractionPlans.

    Dialect translation + parse validation happen here (compile time), so a
    bad metadata expression fails fast with the table/column named — the
    reference only failed at runtime inside MySQL.

    The config join itself runs as DataFrame ops (broadcast — config scale),
    then collapses to driver-side plan objects, mirroring the reference's
    ``list[{TableID, FullTableName, DataExtractQuery}]`` IR
    (``staging_data_extraction.py:276-327``).
    """
    table_detail = catalog.active_tables().select(
        "TableID", "SchemaName", "TableName", "LoadType", "IncrementalFilter"
    )
    cols = (
        table_detail.join(catalog.column_config, "TableID")
        .where(F.col("IncludeFlag"))
        .select(
            "TableID",
            "SchemaName",
            "TableName",
            "LoadType",
            "IncrementalFilter",
            "ColumnID",
            "ColumnName",
            "AliasName",
            "TransformationLogic",
        )
        .collect()
    )
    by_table: dict[int, dict] = {}
    for r in sorted(cols, key=lambda r: (r["TableID"], r["ColumnID"])):
        entry = by_table.setdefault(
            r["TableID"],
            {
                "schema_name": r["SchemaName"],
                "table_name": r["TableName"],
                "load_type": r["LoadType"],
                "incremental_filter": r["IncrementalFilter"],
                "projections": [],
            },
        )
        logic = r["TransformationLogic"]
        use_logic = logic is not None and logic.strip() != ""
        raw_expr = logic if use_logic else r["ColumnName"]
        alias = r["AliasName"] if r["AliasName"] is not None else r["ColumnName"]
        try:
            spark_expr = dialect.validate(raw_expr)
        except dialect.DialectError as exc:
            raise dialect.DialectError(
                f"table {r['SchemaName']}.{r['TableName']} column {alias}: {exc}"
            ) from exc
        entry["projections"].append((spark_expr, alias))

    plans: list[ExtractionPlan] = []
    for table_id, entry in sorted(by_table.items()):
        filter_sql = None
        if entry["load_type"] == "INCREMENTAL" and entry["incremental_filter"] is not None:
            filter_sql = dialect.validate(entry["incremental_filter"])
        plans.append(
            ExtractionPlan(
                table_id=table_id,
                schema_name=entry["schema_name"],
                table_name=entry["table_name"],
                load_type=entry["load_type"],
                projections=entry["projections"],
                filter_sql=filter_sql,
            )
        )
    return plans
