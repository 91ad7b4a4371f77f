from .io import (
    read_table,
    read_tsv,
    read_json_lines,
    write_stable_parquet,
    overwrite_partitions,
)

__all__ = [
    "read_table", "read_tsv", "read_json_lines",
    "write_stable_parquet", "overwrite_partitions",
]
