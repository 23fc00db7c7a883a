from mapreducemovieanalysis_cloud_spark.sources.readers import (
    load_table,
    load_tables,
    read_movielens_csv,
    register_views,
)
from mapreducemovieanalysis_cloud_spark.sources.writers import write_table

__all__ = [
    "load_table",
    "load_tables",
    "read_movielens_csv",
    "register_views",
    "write_table",
]
