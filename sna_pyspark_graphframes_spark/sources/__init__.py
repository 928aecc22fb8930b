from sna_pyspark_graphframes_spark.sources.tables import (
    TABLE_SCHEMAS,
    load_table,
    load_tables,
)
from sna_pyspark_graphframes_spark.sources.edgelist import (
    read_edge_list,
    write_edge_list,
)
from sna_pyspark_graphframes_spark.sources.robust import (
    read_csv_robust,
    split_corrupt,
)

__all__ = [
    "TABLE_SCHEMAS",
    "load_table",
    "load_tables",
    "read_edge_list",
    "write_edge_list",
    "read_csv_robust",
    "split_corrupt",
]
