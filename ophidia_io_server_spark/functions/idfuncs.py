"""Row-subset built-ins: pure ``id_dim`` index arithmetic.

Semantics re-derived from the reference implementations in
``/root/reference/src/query_engine/oph_query_expression_functions.c:30-200``
(registration ``oph_query_expression_evaluator.c:238-244``).  These are the
datacube-subsetting predicates the client framework puts in WHERE clauses;
as plain Column math they stay inside WholeStageCodegen and — crucially for
scale — remain eligible for predicate pushdown / partition pruning when the
cube is range-partitioned by ``id_dim``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ophidia_io_server_spark.dialect.expression import EV
from ophidia_io_server_spark.functions import primitive


@primitive("oph_id", doc="1 + (id-1)/size with C integer division: outer-dimension index")
def oph_id(args, ctx):
    # reference computes floor() over a *C integer division* of long longs,
    # i.e. truncation toward zero happens before floor — emulate with cast.
    id_c = args[0].numeric()
    size = args[1].numeric()
    return EV(((id_c - 1) / size).cast("long") + 1)


@primitive("oph_id2", doc="block-structured id remap (reference oph_id2)")
def oph_id2(args, ctx):
    # reference: 1 + (id - 1 % block_size) + floor((id-1)/(size*block_size)) * block_size
    # NOTE: C precedence makes `id - 1 % block_size` parse as `id - (1 % block_size)`;
    # we reproduce the evidently *intended* formula (id-1) % block_size, and
    # document the divergence (the C expression degenerates to id for bs>1).
    id_c = args[0].numeric()
    size = args[1].numeric()
    bs = args[2].numeric()
    return EV(
        (1 + ((id_c - 1) % bs) + F.floor((id_c - 1) / (size * bs)).cast("long") * bs).cast("long")
    )


@primitive("oph_id_to_index", doc="unravel row id into the index of one dimension")
def oph_id_to_index(args, ctx):
    # reference folds: id0 = id-1; for each size: index = id % size; id = (id-index)/size
    id_c = (args[0].numeric() - 1).cast("long")
    index = id_c
    for a in args[1:]:
        size = a.numeric()
        index = id_c % size
        id_c = ((id_c - index) / size).cast("long")
    return EV((index + 1).cast("long"))


@primitive("oph_id_to_index2", doc="1 + (floor((id-1)/block_size) % size)")
def oph_id_to_index2(args, ctx):
    id_c = args[0].numeric()
    bs = args[1].numeric()
    size = args[2].numeric()
    return EV((1 + (F.floor((id_c - 1) / bs) % size)).cast("long"))


@primitive("oph_is_in_subset", doc="(id-start)%step==0 AND start<=id<=max")
def oph_is_in_subset(args, ctx):
    id_c = args[0].numeric()
    start = args[1].numeric()
    step = args[2].numeric()
    size = args[3].numeric()
    col = (((id_c - start) % step) == 0) & (id_c >= start) & (id_c <= size)
    return EV(col, boolean=True)


@primitive("oph_id_of_subset", doc="sequential index of id within subset start:step")
def oph_id_of_subset(args, ctx):
    # companion of oph_is_in_subset: position (1-based) of id in the arithmetic
    # progression start, start+step, ...
    id_c = args[0].numeric()
    start = args[1].numeric()
    step = args[2].numeric()
    return EV((F.floor((id_c - start) / step).cast("long") + 1))


@primitive("oph_id3", doc="id remap over an irregular dimension split (reference oph_id3)")
def oph_id3(args, ctx):
    """Reference (oph_query_expression_functions.c:76-135): given a fragment
    row id, a list of per-chunk row counts and a block size, map the id onto
    the concatenated-chunk layout.  The list argument arrives as an array
    literal/column instead of the reference's packed-binary blob."""
    from ophidia_io_server_spark.dialect.expression import ExprError

    k = args[0].numeric() - 1
    sizes = args[1]
    bs = args[2].numeric()
    if not (sizes.is_literal and isinstance(sizes.pyval, str)):
        raise ExprError("oph_id3: sizes must be a 'csv' string literal, e.g. '2,3'")
    lst = [int(s) for s in sizes.pyval.split(",")]
    reduced = sum(lst)
    row_index = F.floor(k / bs).cast("long")
    rel = row_index % reduced
    # find chunk i such that rel in [start_i, stop_i); emulate the loop with a
    # when-chain over the (small, literal) list
    start = 0
    i_col = F.lit(len(lst) - 1)
    for i, n in enumerate(lst[:-1]):
        stop = start + n
        i_col = F.when((rel >= start) & (rel < stop), i).otherwise(i_col)
        start = stop
    out = (k % bs) + (i_col + F.floor(row_index / reduced).cast("long") * len(lst)) * bs + 1
    return EV(out.cast("long"))
