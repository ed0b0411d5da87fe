"""memvid_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of memvid/memvid (see SURVEY.md).

Layout:
- session / catalog: SparkSession config + lazy parquet catalog
- functions/: scalar Column-expression building blocks (text, hashing, vector)
- operators/: search, top-k, RRF, dedup, k-NN, temporal state
- registry: the query inventory with DuckDB oracle twins
"""

from .api import MemvidSpark
from .catalog import Catalog, load
from .session import configure, fan_out, get_spark

__all__ = [
    "Catalog",
    "MemvidSpark",
    "configure",
    "fan_out",
    "get_spark",
    "load",
]
