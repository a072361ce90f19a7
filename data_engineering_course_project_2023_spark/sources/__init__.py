from .readers import (  # noqa: F401
    load_table,
    load_tables,
    read_jsonl,
    scan_subset,
)
from .writers import write_jsonl, write_parquet_parts  # noqa: F401
