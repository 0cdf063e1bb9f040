from .catalog import (
    TABLES,
    assert_unique_key,
    load_table,
    load_tables,
    read_csv_strict,
    read_csv_with_badrecords,
    read_jdbc,
    write_jdbc,
    write_overwrite,
)

__all__ = [
    "TABLES",
    "assert_unique_key",
    "load_table",
    "load_tables",
    "read_csv_strict",
    "read_csv_with_badrecords",
    "read_jdbc",
    "write_jdbc",
    "write_overwrite",
]
