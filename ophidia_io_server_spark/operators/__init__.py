from ophidia_io_server_spark.operators.engine import IOServer  # noqa: F401
