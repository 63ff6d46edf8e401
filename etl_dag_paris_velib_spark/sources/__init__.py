from .readers import read_csv, read_json, read_parquet
from .tpch import load_table, load_tables
from .velib import flatten_station_status, ingest_station_status
from .weather import flatten_weather, ingest_weather

__all__ = [
    "read_csv",
    "read_json",
    "read_parquet",
    "load_table",
    "load_tables",
    "flatten_station_status",
    "ingest_station_status",
    "flatten_weather",
    "ingest_weather",
]
