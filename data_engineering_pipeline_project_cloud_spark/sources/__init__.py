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
    "add_check_constraint",
    "add_column_to_manifest",
    "add_generated_column",
    "add_table_constraint",
    "assert_unique_key",
    "convert_to_manifest",
    "copy_into",
    "delete_where",
    "delete_where_dv",
    "describe_manifest",
    "drop_check_constraint",
    "drop_generated_column_decl",
    "drop_table_constraint",
    "expire_copy_registry",
    "evolve_partition_spec",
    "load_table",
    "load_tables",
    "manifest_files",
    "optimize_manifest",
    "read_csv_strict",
    "read_csv_with_badrecords",
    "read_jdbc",
    "read_manifest",
    "set_cluster_by",
    "set_column_default",
    "set_table_properties",
    "truncate_manifest",
    "update_manifest",
    "vacuum_manifest",
    "write_frame",
    "write_jdbc",
    "write_overwrite",
]


def _lazy(name: str):
    # manifest-source helpers re-exported lazily so `sources` stays
    # importable without the pyspark datasource extras
    def call(*args, **kwargs):
        from . import manifest_source as ms

        return getattr(ms, name)(*args, **kwargs)

    call.__name__ = name
    call.__doc__ = (f"Public alias for manifest_source.{name} "
                    "(lazy import).")
    return call


read_manifest = _lazy("read_manifest")
add_check_constraint = _lazy("add_check_constraint")
add_generated_column = _lazy("add_generated_column")
add_table_constraint = _lazy("add_table_constraint")
add_column_to_manifest = _lazy("add_column_to_manifest")
convert_to_manifest = _lazy("convert_to_manifest")
delete_where = _lazy("delete_where")
delete_where_dv = _lazy("delete_where_dv")
truncate_manifest = _lazy("truncate_manifest")
drop_check_constraint = _lazy("drop_check_constraint")
drop_generated_column_decl = _lazy("drop_generated_column_decl")
drop_table_constraint = _lazy("drop_table_constraint")
set_column_default = _lazy("set_column_default")
copy_into = _lazy("copy_into")
expire_copy_registry = _lazy("expire_copy_registry")
describe_manifest = _lazy("describe_manifest")
evolve_partition_spec = _lazy("evolve_partition_spec")
manifest_files = _lazy("manifest_files")
optimize_manifest = _lazy("optimize_manifest")
set_cluster_by = _lazy("set_cluster_by")
set_table_properties = _lazy("set_table_properties")
update_manifest = _lazy("update_manifest")
vacuum_manifest = _lazy("vacuum_manifest")
write_frame = _lazy("write_frame")
