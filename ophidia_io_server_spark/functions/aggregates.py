"""Cross-row AGGREGATE primitives (reference FUN AGGREGATE entries:
oph_aggregate_operator, oph_aggregate_stats[, _partial, _final], oph_roll_up —
``/root/reference/etc/oph_primitives_list.in``; executor lifecycle
add/exec/clear ``src/query_engine/oph_query_plugin_executor.c:480-680``).

The reference's row-machine (per-row ``add``, group-boundary ``exec``) is
re-expressed as declarative aggregate Columns, so Spark performs partial
(map-side) + final aggregation natively — the two-phase split the reference
only emulated with its *_partial/*_final plugin pair.

Scale note: the Column forms below collect each group's arrays and fold them
on the reducer.  That is exactly what the reference does (per-group array
state), is correct at any group width that fits an executor, and benefits
from map-side partial aggregation.  For extremely wide groups, the
positional-explode alternative in ``operators/array_agg.py`` trades one
shuffle for bounded memory.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ophidia_io_server_spark.dialect.expression import EV, ExprError
from ophidia_io_server_spark.functions import primitive, str_arg
from ophidia_io_server_spark.functions.core import strip_type_tags


def _ew(op: str):
    ops = {
        "sum": lambda x, y: x + y,
        "max": lambda x, y: F.greatest(x, y),
        "min": lambda x, y: F.least(x, y),
        "mul": lambda x, y: x * y,
    }
    key = op.lower().removeprefix("oph_")
    if key in ("avg", "mean"):
        key = "sum"  # divided by count afterwards
    if key not in ops:
        raise ExprError(f"unknown aggregate operation {op!r}")
    return ops[key]


def elementwise_fold(m: Column, op: str) -> Column:
    """Element-wise fold of all arrays in the group into one array."""
    fn = _ew(op)
    lst = F.collect_list(m)
    init = F.lit(None).cast("array<double>")
    folded = F.aggregate(
        lst,
        init,
        lambda acc, x: F.when(acc.isNull(), x.cast("array<double>")).otherwise(
            F.zip_with(acc, x, fn)
        ),
    )
    return folded


@primitive("oph_aggregate_operator", aggregate=True,
           doc="element-wise max/min/sum/avg across the group's arrays")
def oph_aggregate_operator(args, ctx):
    args = strip_type_tags(args)
    m = args[0].col
    op = str_arg(args, 1, "oph_aggregate_operator", "sum").lower().removeprefix("oph_")
    folded = elementwise_fold(m, op)
    if op in ("avg", "mean"):
        cnt = F.count(F.lit(1)).cast("double")
        return EV(F.transform(folded, lambda x: x / cnt))
    return EV(folded)


@primitive("oph_aggregate_stats", aggregate=True,
           doc="element-wise [mean|variance|std|min|max] across group rows; mask picks stats")
def oph_aggregate_stats(args, ctx):
    """oph_aggregate_stats(measure[, 'mask']) — mask is a string of 1/0 flags
    over (mean, variance, std, min, max); default '10000' (mean only).
    Output concatenates the selected per-element stat arrays in order."""
    args = strip_type_tags(args)
    m = args[0].col.cast("array<double>")
    mask = str_arg(args, 1, "oph_aggregate_stats", "10000")
    cnt = F.count(F.lit(1)).cast("double")
    s = elementwise_fold(m, "sum")
    ss = elementwise_fold(F.transform(m, lambda x: x * x), "sum")
    mean = F.zip_with(s, F.array_repeat(cnt, F.size(s).cast("int")), lambda a, n: a / n)
    var = F.zip_with(ss, mean, lambda q, mu: (q - cnt * mu * mu) / (cnt - 1))
    std = F.transform(var, F.sqrt)
    mn = elementwise_fold(m, "min")
    mx = elementwise_fold(m, "max")
    stats = [mean, var, std, mn, mx]
    chosen = [stats[i] for i, flag in enumerate(mask[:5]) if flag == "1"]
    if not chosen:
        raise ExprError("oph_aggregate_stats: empty stat mask")
    out = chosen[0]
    for c in chosen[1:]:
        out = F.concat(out, c)
    return EV(out)


@primitive("oph_aggregate_stats_partial", aggregate=True,
           doc="partial stats state: concat(count, sum[], sumsq[], min[], max[])")
def oph_aggregate_stats_partial(args, ctx):
    args = strip_type_tags(args)
    m = args[0].col.cast("array<double>")
    cnt = F.count(F.lit(1)).cast("double")
    s = elementwise_fold(m, "sum")
    ss = elementwise_fold(F.transform(m, lambda x: x * x), "sum")
    mn = elementwise_fold(m, "min")
    mx = elementwise_fold(m, "max")
    return EV(F.concat(F.array(cnt), s, ss, mn, mx))


@primitive("oph_aggregate_stats_final", aggregate=True,
           doc="combine partial-stats arrays: element-wise merge → [mean|var|std|min|max] per mask")
def oph_aggregate_stats_final(args, ctx):
    """Input rows are oph_aggregate_stats_partial outputs (count, sum, sumsq,
    min, max packed in one array of length 1+4k).  Merges partials and emits
    the same stat layout as oph_aggregate_stats."""
    args = strip_type_tags(args)
    p = args[0].col.cast("array<double>")
    mask = str_arg(args, 1, "oph_aggregate_stats_final", "10000")
    k = (F.size(p) - 1) / 4
    ki = k.cast("int")
    cnt_part = F.element_at(p, 1)
    s_part = F.slice(p, F.lit(2), ki)
    ss_part = F.slice(p, ki + 2, ki)
    mn_part = F.slice(p, 2 * ki + 2, ki)
    mx_part = F.slice(p, 3 * ki + 2, ki)
    cnt = F.sum(cnt_part)
    s = elementwise_fold(s_part, "sum")
    ss = elementwise_fold(ss_part, "sum")
    mn = elementwise_fold(mn_part, "min")
    mx = elementwise_fold(mx_part, "max")
    mean = F.transform(s, lambda x: x / cnt)
    var = F.zip_with(ss, mean, lambda q, mu: (q - cnt * mu * mu) / (cnt - 1))
    std = F.transform(var, F.sqrt)
    stats = [mean, var, std, mn, mx]
    chosen = [stats[i] for i, flag in enumerate(mask[:5]) if flag == "1"]
    out = chosen[0]
    for c in chosen[1:]:
        out = F.concat(out, c)
    return EV(out)


@primitive("oph_roll_up", aggregate=True,
           doc="concatenate the group's arrays ordered by id_dim into one array")
def oph_roll_up(args, ctx):
    args = strip_type_tags(args)
    m = args[0].col
    id_col = F.col(ctx.id_col)
    pairs = F.array_sort(F.collect_list(F.struct(id_col.alias("i"), m.alias("v"))))
    return EV(F.flatten(F.transform(pairs, lambda r: r["v"])))
