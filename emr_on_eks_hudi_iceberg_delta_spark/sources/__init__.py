from .csv import read_csv_with_schema
from .mor import MorTable
from .parquet import TABLES, load_table, load_tables, register_views
from .partitioned import PartitionedTable
from .tables import ConcurrentCommitError, VersionedTable, table_changes

__all__ = [
    "ConcurrentCommitError",
    "MorTable",
    "PartitionedTable",
    "TABLES",
    "VersionedTable",
    "load_table",
    "load_tables",
    "read_csv_with_schema",
    "register_views",
    "table_changes",
]
