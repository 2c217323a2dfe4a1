from ophidia_io_server_spark.dialect.parser import parse_query, split_multivalue  # noqa: F401
from ophidia_io_server_spark.dialect.expression import (  # noqa: F401
    ExprContext,
    compile_expression,
    expression_uses_aggregate,
)
