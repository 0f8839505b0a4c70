"""smfg_datawarehouse_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of the reference repo
rohan-mukherjee/SMFG_DataWarehouse (a metadata-driven MySQL→Parquet ETL
framework) as an idiomatic Spark engine:

- metadata catalog → compiled extraction plans (reference:
  ``source_code/sql/Staging_Extraction_Metadata_Query.sql``)
- three-zone Parquet lake (RAW/STAGING/CURATED, reference:
  ``config/config.yaml:64-69``)
- append-only audit ledger (reference:
  ``source_code/python/airflow_utility/process_logger.py``)
- analytical query surface (joins/aggs/windows/set-ops) on Spark SQL
- LLM-data-pipeline extension operators: dedup (exact/MinHash/Jaccard/
  SimHash), similarity search, text analysis, multimodal columns.

Everything here is built on the public PySpark API only.
"""

from smfg_datawarehouse_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
