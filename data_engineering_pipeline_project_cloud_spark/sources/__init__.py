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
    "read_manifest",
    "write_jdbc",
    "write_overwrite",
]


def read_manifest(*args, **kwargs):
    """Public alias for the manifest table planner
    (:func:`.manifest_source.read_manifest`) — imported lazily so
    `sources` stays importable without the pyspark datasource extras.
    """
    from .manifest_source import read_manifest as _rm

    return _rm(*args, **kwargs)
