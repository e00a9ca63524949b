"""Static type tests for colnade_spark.expr (mypy --strict / ty).

Must produce zero type errors.

DESIGN NOTE (divergence from the reference, SURVEY.md §3): the reference
parameterizes every AST node by dtype (``BinOp[Bool]``, ``Agg[Float64]``).
Here the static dtype machinery lives entirely in ``Column[DType]`` —
the AST nodes (``BinOp``, ``Agg``, ...) are untyped plan IR, because the
Spark backend re-derives types from the Catalyst plan anyway. What IS
statically pinned: every Column operation returns the documented node
class, sort/alias/window builders produce the right builder types, and
the ``when`` chain only exposes the legal next step.
"""

from colnade_spark import (
    Column,
    Datetime,
    Float64,
    Int64,
    Schema,
    Utf8,
    lit,
    when,
)
from colnade_spark.expr import (
    Agg,
    AliasedExpr,
    BinOp,
    ColumnRef,
    Expr,
    FunctionCall,
    JoinCondition,
    ListOp,
    Literal,
    SortExpr,
    StructFieldAccess,
    UnaryOp,
    WhenThenOtherwise,
    WindowExpr,
    dense_rank,
    lag,
    lead,
    rank,
    row_number,
)


class Users(Schema):
    id: Column[Int64]
    name: Column[Utf8]
    score: Column[Float64]
    created: Column[Datetime]


# --- AST node classes are importable and usable as types -------------------


def check_ast_nodes_exist() -> None:
    _e: type[Expr] = Expr
    _c: type[ColumnRef] = ColumnRef
    _l: type[Literal] = Literal
    _b: type[BinOp] = BinOp
    _u: type[UnaryOp] = UnaryOp
    _a: type[Agg] = Agg
    _f: type[FunctionCall] = FunctionCall
    _al: type[AliasedExpr] = AliasedExpr
    _s: type[SortExpr] = SortExpr
    _sf: type[StructFieldAccess] = StructFieldAccess
    _lo: type[ListOp] = ListOp
    _w: type[WhenThenOtherwise] = WhenThenOtherwise
    _j: type[JoinCondition] = JoinCondition
    _ = (_e, _c, _l, _b, _u, _a, _f, _al, _s, _sf, _lo, _w, _j)


# --- Expr inheritance: nodes are Exprs, builders are not -------------------


def check_nodes_are_exprs(b: BinOp, a: Agg, f: FunctionCall) -> None:
    _1: Expr = b
    _2: Expr = a
    _3: Expr = f
    _ = (_1, _2, _3)


def check_neg_sortexpr_not_expr(s: SortExpr) -> None:
    """SortExpr is a sort directive, deliberately NOT an Expr."""
    _: Expr = s  # type: ignore[assignment]


def check_neg_joincondition_not_expr(j: JoinCondition) -> None:
    """JoinCondition is a join spec, deliberately NOT an Expr."""
    _: Expr = j  # type: ignore[assignment]


# --- Column operations return the documented node classes ------------------


def check_arithmetic_returns_binop() -> None:
    _add: BinOp = Users.score + 1.0
    _sub: BinOp = Users.score - 1.0
    _mul: BinOp = Users.score * 2.0
    _div: BinOp = Users.score / 2.0
    _mod: BinOp = Users.id % 2
    _ = (_add, _sub, _mul, _div, _mod)


def check_reflected_arithmetic_returns_binop() -> None:
    _radd: BinOp = 1.0 + Users.score
    _rsub: BinOp = 1.0 - Users.score
    _ = (_radd, _rsub)


def check_comparisons_return_binop() -> None:
    _gt: BinOp = Users.score > 1.0
    _lt: BinOp = Users.score < 1.0
    _ge: BinOp = Users.score >= 1.0
    _le: BinOp = Users.score <= 1.0
    _ne: BinOp = Users.name != "x"
    _ = (_gt, _lt, _ge, _le, _ne)


def check_boolean_combinators_return_binop() -> None:
    _and: BinOp = (Users.score > 1.0) & (Users.id > 0)
    _or: BinOp = (Users.score > 1.0) | (Users.id > 0)
    _ = (_and, _or)


def check_aggregations_return_agg() -> None:
    _sum: Agg = Users.score.sum()
    _mean: Agg = Users.score.mean()
    _min: Agg = Users.score.min()
    _max: Agg = Users.score.max()
    _count: Agg = Users.id.count()
    _std: Agg = Users.score.std()
    _var: Agg = Users.score.var()
    _first: Agg = Users.name.first()
    _last: Agg = Users.name.last()
    _nu: Agg = Users.name.n_unique()
    _ = (_sum, _mean, _min, _max, _count, _std, _var, _first, _last, _nu)


def check_string_functions_return_functioncall() -> None:
    _c: FunctionCall = Users.name.str_contains("a")
    _s: FunctionCall = Users.name.str_starts_with("a")
    _e: FunctionCall = Users.name.str_ends_with("a")
    _l: FunctionCall = Users.name.str_len()
    _lo: FunctionCall = Users.name.str_to_lowercase()
    _up: FunctionCall = Users.name.str_to_uppercase()
    _st: FunctionCall = Users.name.str_strip()
    _re: FunctionCall = Users.name.str_replace("a", "b")
    _ = (_c, _s, _e, _l, _lo, _up, _st, _re)


def check_temporal_functions_return_functioncall() -> None:
    _y: FunctionCall = Users.created.dt_year()
    _mo: FunctionCall = Users.created.dt_month()
    _d: FunctionCall = Users.created.dt_day()
    _h: FunctionCall = Users.created.dt_hour()
    _mi: FunctionCall = Users.created.dt_minute()
    _se: FunctionCall = Users.created.dt_second()
    _tr: FunctionCall = Users.created.dt_truncate("day")
    _ = (_y, _mo, _d, _h, _mi, _se, _tr)


def check_null_nan_cast() -> None:
    _fn: FunctionCall = Users.score.fill_null(0.0)
    _fnan: FunctionCall = Users.score.fill_nan(0.0)
    _an: FunctionCall = Users.score.assert_non_null()
    _ = (_fn, _fnan, _an)


def check_alias_returns_aliased_expr() -> None:
    _a: AliasedExpr = Users.score.alias("s")
    _b: AliasedExpr = (Users.score + 1.0).alias("s1")
    _c: AliasedExpr = Users.score.sum().alias("total")
    _ = (_a, _b, _c)


def check_sort_builders() -> None:
    _asc: SortExpr = Users.name.asc()
    _desc: SortExpr = Users.name.desc()
    _ = (_asc, _desc)


# --- when/then/otherwise chain only exposes the legal next step ------------


def check_when_chain() -> None:
    _done: WhenThenOtherwise = (
        when(Users.score > 1.0).then(1).when(Users.score > 0.0).then(0).otherwise(-1)
    )
    _ = _done


def check_when_result_is_expr() -> None:
    e = when(Users.score > 1.0).then(1).otherwise(0)
    _: Expr = e
    _a: AliasedExpr = e.alias("bucket")
    _ = _a


# --- lit and window helpers ------------------------------------------------


def check_lit_returns_literal() -> None:
    _l: Literal = lit(1)
    _ = _l


def check_window_helpers_return_windowexpr() -> None:
    _rn: WindowExpr = row_number(partition_by=Users.id, order_by=Users.score.desc())
    _rk: WindowExpr = rank(partition_by=Users.id, order_by=Users.score)
    _dr: WindowExpr = dense_rank(partition_by=Users.id, order_by=Users.score)
    _lg: WindowExpr = lag(Users.score, 1, partition_by=Users.id, order_by=Users.created)
    _ld: WindowExpr = lead(Users.score, 1, partition_by=Users.id, order_by=Users.created)
    _ = (_rn, _rk, _dr, _lg, _ld)


def check_agg_over_returns_functioncall() -> None:
    _w: FunctionCall = Users.score.mean().over(Users.id)
    _ = _w


# --- rolling windows / math / regex / membership (extension surface) -------


def check_rank_dist_helpers_return_windowexpr() -> None:
    from colnade_spark import cume_dist, percent_rank

    _pr: WindowExpr = percent_rank(partition_by=Users.id, order_by=Users.score)
    _cd: WindowExpr = cume_dist(partition_by=Users.id, order_by=Users.score.desc())
    _ = (_pr, _cd)


def check_rolling_helpers_return_windowexpr() -> None:
    from colnade_spark import rolling_count, rolling_mean, rolling_sum

    _rs: WindowExpr = rolling_sum(
        Users.score, partition_by=Users.id, order_by=Users.created.dt_epoch_day(),
        preceding=29, range_frame=True,
    )
    _rc: WindowExpr = rolling_count(
        Users.score, partition_by=Users.id, order_by=Users.id, preceding=4
    )
    _rm: WindowExpr = rolling_mean(
        Users.score, partition_by=Users.id, order_by=Users.id, preceding=4, following=4
    )
    _ = (_rs, _rc, _rm)


def check_math_functions_numeric_gated() -> None:
    # numeric column: every math fn returns a FunctionCall, chainable on Expr
    _a: FunctionCall = Users.score.abs()
    _r: FunctionCall = Users.score.round(2)
    _f: FunctionCall = Users.score.floor()
    _c: FunctionCall = Users.score.ceil()
    _s: FunctionCall = Users.score.sqrt().round(6)
    _l: FunctionCall = Users.score.ln()
    _g: FunctionCall = Users.score.log10()
    _e: FunctionCall = Users.score.exp()
    _p: FunctionCall = Users.score.pow(2)
    _ = (_a, _r, _f, _c, _s, _l, _g, _e, _p)


def check_regex_functions_str_gated() -> None:
    _x: FunctionCall = Users.name.str_extract(r"(\d+)", 1)
    _m: FunctionCall = Users.name.str_matches(r"\d+")
    _sp: FunctionCall = Users.name.str_split(",")
    _sl: FunctionCall = Users.name.str_slice(0, 5)
    _ = (_x, _m, _sp, _sl)


def check_is_in_returns_functioncall() -> None:
    _i: FunctionCall = Users.name.is_in(["a", "b"])
    _n: FunctionCall = Users.id.is_in([1, 2, 3])
    _ = (_i, _n)


def check_dt_arith_and_variadic_fns() -> None:
    from colnade_spark import concat_str, greatest, least

    _ad: FunctionCall = Users.created.dt_add("day", 30)
    _df: FunctionCall = Users.created.dt_diff("hour", Users.created.dt_truncate("day"))
    _ed: FunctionCall = Users.created.dt_epoch_day()
    _g: FunctionCall = greatest(Users.score, 0.0)
    _l: FunctionCall = least(Users.score, Users.id)
    _c: FunctionCall = concat_str(Users.name, Users.name, sep="-")
    _cm: FunctionCall = Users.name.str_count_matches(r"\d")
    _em: BinOp = Users.score.eq_missing(1.0)
    _ = (_ad, _df, _ed, _g, _l, _c, _cm, _em)


def check_list_ext_ops_chainable() -> None:
    _u: ListOp = Users.name.str_split(",").list.unique()
    _s: ListOp = Users.name.str_split(",").list.sort().list.slice(0, 2)
    _j: ListOp = Users.name.str_split(",").list.join("|")
    _ = (_u, _s, _j)
