from sna_pyspark_graphframes_spark.sources.tables import (
    TABLE_SCHEMAS,
    load_table,
    load_tables,
)
from sna_pyspark_graphframes_spark.sources.edgelist import (
    read_edge_list,
    write_edge_list,
)

__all__ = [
    "TABLE_SCHEMAS",
    "load_table",
    "load_tables",
    "read_edge_list",
    "write_edge_list",
]
