"""Error-surface documentation tests (mypy --strict / ty).

Must produce zero type errors. Documents WHERE each error class is caught
in this design — statically, or by the runtime guard layer — so a reader
knows what the checker guarantees and what the engine guarantees.

DESIGN SPLIT (SURVEY.md §3; diverges from the reference):
- STATIC:  frame/schema identity (DataFrame[Users] ≠ DataFrame[Orders] ≠
  LazyFrame), argument shapes (sort takes Column|SortExpr, with_columns
  takes AliasedExpr), transform results (select erases, cast_schema
  re-binds), item() scalar types.
- RUNTIME (raised eagerly at expression-build or plan-build time, before
  any Spark job): dtype method gates (``.sum()`` on Utf8 → TypeError,
  ``.is_nan()`` on non-float → TypeError, ``.field()`` on non-struct,
  ``.list`` on non-list), cross-schema column guards (filter with a
  foreign column → ColumnGuardError), literal type checks under
  validation (``fill_null("x")`` on an Int column → TypeError).
The reference encodes the dtype gates statically via self-narrowing
Column[DType] method overloads; here they are runtime because the AST is
untyped plan IR (test_coverage_matrix.py row 3). The runtime gates are
pinned by tests/unit/test_schema.py and tests/integration/test_validation.py.
"""

from colnade_spark import (
    Column,
    ColumnGuardError,
    DataFrame,
    Float64,
    Int64,
    LazyFrame,
    Schema,
    SchemaError,
    Utf8,
)


class Users(Schema):
    id: Column[Int64]
    name: Column[Utf8]
    score: Column[Float64]


class Orders(Schema):
    order_id: Column[Int64]
    user_id: Column[Int64]


# --- Static: argument-shape errors -----------------------------------------


def check_neg_sort_str_rejected(df: DataFrame[Users]) -> None:
    """sort("name") is a static arg-type error (and a runtime TypeError)."""
    df.sort("name")  # type: ignore[arg-type]


def check_neg_with_columns_bare_column_rejected(df: DataFrame[Users]) -> None:
    """with_columns(Users.score) without .alias() is statically rejected."""
    df.with_columns(Users.score)  # type: ignore[arg-type]


def check_neg_group_agg_bare_agg_rejected(df: DataFrame[Users]) -> None:
    """group_by().agg(col.sum()) without .alias() is statically rejected."""
    df.group_by(Users.name).agg(Users.score.sum())  # type: ignore[arg-type]


def check_neg_join_on_plain_bool_rejected(
    users: DataFrame[Users], orders: DataFrame[Orders]
) -> None:
    """join(on=True) is a static error — on takes a JoinCondition."""
    users.join(orders, on=True)  # type: ignore[arg-type]


# --- Static: identity errors (see test_dataframe/test_join for the full set)


def check_neg_frame_identity(df: DataFrame[Users], lf: LazyFrame[Users]) -> None:
    _a: DataFrame[Orders] = df  # type: ignore[assignment]
    _b: DataFrame[Users] = lf  # type: ignore[assignment]


# --- Runtime: dtype gates and guards (typed here, raised when executed) ----
# These compile cleanly — the errors are RUNTIME contracts. Each has an
# executing twin in the runtime suite; listed here so the split is explicit.


def runtime_sum_on_utf8_raises(df: DataFrame[Users]) -> None:
    """Users.name.sum() raises TypeError at expression-build time — AND,
    since round 10, is caught STATICALLY by scripts/static_typecheck.py's
    dtype-method gate (the deliberate misuse below carries the
    `# static: ignore` marker, the gate's `# type: ignore` analog; the
    un-ignored twin is pinned in test_static_gate.py).
    Runtime twin: tests/unit/test_schema.py (dtype gating)."""
    try:
        df.group_by(Users.id).agg(Users.name.sum().alias("x"))  # static: ignore
    except TypeError:
        pass


def runtime_foreign_column_guard(df: DataFrame[Users]) -> None:
    """Filtering Users by an Orders column raises ColumnGuardError before
    any Spark job. Runtime twin: tests/integration/test_execution.py."""
    try:
        df.filter(Orders.user_id > 0)
    except ColumnGuardError:
        pass


def runtime_cast_schema_missing_source(df: DataFrame[Users]) -> None:
    """cast_schema to a schema with an unmatched column raises SchemaError
    with the missing column names attached."""
    try:
        df.select(Users.id).cast_schema(Orders)
    except SchemaError:
        pass
