from ophidia_io_server_spark.sources.random_import import random_fragment  # noqa: F401
from ophidia_io_server_spark.sources.tables import load_table, lineitem_fragment  # noqa: F401
