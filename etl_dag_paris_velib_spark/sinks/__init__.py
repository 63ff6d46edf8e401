from .writers import export_csv, export_json, write_partitioned_table

__all__ = ["export_csv", "export_json", "write_partitioned_table"]
