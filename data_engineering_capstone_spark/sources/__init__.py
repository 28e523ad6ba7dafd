from .readers import (  # noqa: F401
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    read_sas,
    read_semicolon_csv,
)
from .testdata import TABLES, load_table, load_tables, register_views  # noqa: F401
from .writers import write_parquet  # noqa: F401
