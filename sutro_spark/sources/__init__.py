from sutro_spark.sources.ingest import (
    ROW_ID,
    prepare_input_data,
    read_csv,
    read_parquet,
    read_text,
    with_row_id,
)

__all__ = ["ROW_ID", "prepare_input_data", "read_csv", "read_parquet", "read_text", "with_row_id"]
