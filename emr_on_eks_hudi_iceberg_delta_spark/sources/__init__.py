from .csv import read_csv_with_schema
from .parquet import TABLES, load_table, load_tables, register_views
from .tables import VersionedTable

__all__ = [
    "read_csv_with_schema",
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "VersionedTable",
]
