from .catalog import LakeCatalog
from .csv import read_csv_with_schema
from .delta_log import DeltaLogTable
from . import delta_dml as _delta_dml  # noqa: F401 — attaches DELETE/UPDATE
from . import delta_cdf as _delta_cdf  # noqa: F401 — attaches CDF
from . import delta_colmap as _delta_colmap  # noqa: F401 — attaches RENAME/DROP COLUMN
from . import delta_gen as _delta_gen  # noqa: F401 — attaches generated columns
from .hudi_layout import HudiCowTable, HudiMorTable
from . import hudi_maintenance as _hudi_maintenance  # noqa: F401 — attaches savepoint/restore/cluster
from . import hudi_cdc as _hudi_cdc  # noqa: F401 — attaches cdc_scan
from .iceberg_layout import IcebergTable
from . import iceberg_deletes as _iceberg_deletes  # noqa: F401 — attaches DELETE/rollback
from . import iceberg_inspect as _iceberg_inspect  # noqa: F401 — attaches tbl.files/.snapshots
from . import iceberg_refs as _iceberg_refs  # noqa: F401 — attaches branches/tags/WAP
from . import iceberg_changelog as _iceberg_changelog  # noqa: F401 — attaches changes()
from . import fsck as _fsck  # noqa: F401 — attaches table verification
from .convert import (
    convert_delta_to_iceberg,
    convert_hudi_to_delta,
    convert_iceberg_to_delta,
    convert_parquet_dir_to_delta,
)
from . import uniform as _uniform  # noqa: F401 — attaches enable/sync_uniform
from .delta_source import DeltaLogDataSource, register_deltalog_source
from .delta_cdf_source import DeltaCdfDataSource, register_deltacdf_source
from .hudi_incr_source import HudiIncrDataSource, register_hudiincr_source
from .hudi_cdc_source import HudiCdcDataSource, register_hudicdc_source
from .iceberg_changelog_source import (
    IcebergLogDataSource,
    register_iceberglog_source,
)
from .datasource import (
    VersionedTableDataSource,
    register_vtable_source,
)
from .formats import read_json_lines, read_orc, write_json_lines, write_orc
from .mor import MorTable
from .parquet import TABLES, load_table, load_tables, register_views
from .partitioned import PartitionedTable
from .tables import (
    ConcurrentCommitError,
    ConstraintViolationError,
    VersionedTable,
    table_changes,
)

__all__ = [
    "ConcurrentCommitError",
    "HudiIncrDataSource",
    "register_hudiincr_source",
    "register_hudicdc_source",
    "IcebergLogDataSource",
    "register_iceberglog_source",
    "LakeCatalog",
    "VersionedTableDataSource",
    "register_vtable_source",
    "ConstraintViolationError",
    "MorTable",
    "PartitionedTable",
    "TABLES",
    "VersionedTable",
    "load_table",
    "load_tables",
    "read_csv_with_schema",
    "read_json_lines",
    "read_orc",
    "register_views",
    "table_changes",
    "write_json_lines",
    "write_orc",
]
