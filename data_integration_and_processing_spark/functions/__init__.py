from data_integration_and_processing_spark.functions.naming import clean_name, clean_columns, rename_columns
from data_integration_and_processing_spark.functions.schema_mapping import (
    pandas_dtype_to_spark,
    schema_for_pandas,
    spark_type_to_clickhouse_ddl,
    spark_type_to_postgres_ddl,
)

__all__ = [
    "clean_name",
    "clean_columns",
    "rename_columns",
    "pandas_dtype_to_spark",
    "schema_for_pandas",
    "spark_type_to_clickhouse_ddl",
    "spark_type_to_postgres_ddl",
]
