"""Fixtures for end-to-end pipeline tests: seeded synthetic parquet files
written with pyarrow, read back through the typed Spark surface.

Mirrors the reference's e2e fixture layer
(/root/reference/tests/e2e/conftest.py:17-144 — users/orders/products/
order_items/struct/list/nullable tables with planted nulls) without the
Polars dependency: generation is plain random + pyarrow.
"""

from __future__ import annotations

import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from colnade_spark.dtypes import Float64, Int64, List, Struct, Utf8
from colnade_spark.schema import Column, Schema

# ---------------------------------------------------------------------------
# Schemas (module level: annotation strings resolve against module globals)
# ---------------------------------------------------------------------------


class Users(Schema):
    id: Column[Int64]
    name: Column[Utf8]
    age: Column[Int64]
    score: Column[Float64 | None]


class Orders(Schema):
    id: Column[Int64]
    user_id: Column[Int64]
    amount: Column[Float64]


class Products(Schema):
    product_id: Column[Int64]
    product_name: Column[Utf8]
    price: Column[Float64]


class OrderItems(Schema):
    order_id: Column[Int64]
    product_id: Column[Int64]
    quantity: Column[Int64]


class Address(Schema):
    street: Column[Utf8]
    city: Column[Utf8]


class StructUsers(Schema):
    id: Column[Int64]
    name: Column[Utf8]
    address: Column[Struct[Address]]


class ListUsers(Schema):
    id: Column[Int64]
    name: Column[Utf8]
    tags: Column[List[Utf8]]
    scores: Column[List[Float64]]


class NullableUsers(Schema):
    id: Column[Int64]
    name: Column[Utf8]
    age: Column[Int64 | None]
    score: Column[Float64 | None]


# ---------------------------------------------------------------------------
# Data generators (seeded — every run sees identical data)
# ---------------------------------------------------------------------------


def make_users(n: int = 100) -> dict[str, list]:
    rng = random.Random(42)
    return {
        "id": list(range(1, n + 1)),
        "name": [f"user_{i:03d}" for i in range(1, n + 1)],
        "age": [rng.randint(18, 65) for _ in range(n)],
        "score": [
            round(rng.uniform(0, 100), 2) if i % 10 != 0 else None for i in range(n)
        ],
    }


def make_orders(n: int = 200, max_user_id: int = 100) -> dict[str, list]:
    rng = random.Random(123)
    return {
        "id": list(range(1, n + 1)),
        "user_id": [rng.randint(1, max_user_id) for _ in range(n)],
        "amount": [round(rng.uniform(10, 500), 2) for _ in range(n)],
    }


def make_products(n: int = 50) -> dict[str, list]:
    rng = random.Random(99)
    return {
        "product_id": list(range(1, n + 1)),
        "product_name": [f"product_{i}" for i in range(1, n + 1)],
        "price": [round(rng.uniform(5, 200), 2) for _ in range(n)],
    }


def make_order_items(
    n: int = 300, max_order_id: int = 200, max_product_id: int = 50
) -> dict[str, list]:
    rng = random.Random(77)
    return {
        "order_id": [rng.randint(1, max_order_id) for _ in range(n)],
        "product_id": [rng.randint(1, max_product_id) for _ in range(n)],
        "quantity": [rng.randint(1, 10) for _ in range(n)],
    }


def make_struct_users(n: int = 20) -> dict[str, list]:
    cities = ["Springfield", "Riverton", "Lakewood", "Hillcrest", "Maplewood"]
    return {
        "id": list(range(1, n + 1)),
        "name": [f"user_{i:03d}" for i in range(1, n + 1)],
        "address": [
            {"street": f"{i * 100} Main St", "city": cities[(i - 1) % 5]}
            for i in range(1, n + 1)
        ],
    }


def make_list_users(n: int = 20) -> dict[str, list]:
    rng = random.Random(55)
    all_tags = ["admin", "user", "editor", "viewer", "manager"]
    return {
        "id": list(range(1, n + 1)),
        "name": [f"user_{i:03d}" for i in range(1, n + 1)],
        "tags": [rng.sample(all_tags, k=rng.randint(1, 3)) for _ in range(n)],
        "scores": [
            [round(rng.uniform(0, 100), 1) for _ in range(rng.randint(1, 5))]
            for _ in range(n)
        ],
    }


def make_nullable_users(n: int = 50) -> dict[str, list]:
    rng = random.Random(33)
    return {
        "id": list(range(1, n + 1)),
        "name": [f"user_{i:03d}" for i in range(1, n + 1)],
        "age": [rng.randint(18, 65) if i % 5 != 0 else None for i in range(n)],
        "score": [
            round(rng.uniform(0, 100), 2) if i % 3 != 0 else None for i in range(n)
        ],
    }


# ---------------------------------------------------------------------------
# Parquet fixtures
# ---------------------------------------------------------------------------


def _write(tmp_path_factory: pytest.TempPathFactory, name: str, data: dict, schema: pa.Schema) -> str:
    path = str(tmp_path_factory.mktemp("e2e") / f"{name}.parquet")
    pq.write_table(pa.table(data, schema=schema), path)
    return path


@pytest.fixture(scope="session")
def users_parquet(tmp_path_factory: pytest.TempPathFactory) -> str:
    schema = pa.schema(
        [("id", pa.int64()), ("name", pa.string()), ("age", pa.int64()), ("score", pa.float64())]
    )
    return _write(tmp_path_factory, "users", make_users(), schema)


@pytest.fixture(scope="session")
def orders_parquet(tmp_path_factory: pytest.TempPathFactory) -> str:
    schema = pa.schema(
        [("id", pa.int64()), ("user_id", pa.int64()), ("amount", pa.float64())]
    )
    return _write(tmp_path_factory, "orders", make_orders(), schema)


@pytest.fixture(scope="session")
def products_parquet(tmp_path_factory: pytest.TempPathFactory) -> str:
    schema = pa.schema(
        [("product_id", pa.int64()), ("product_name", pa.string()), ("price", pa.float64())]
    )
    return _write(tmp_path_factory, "products", make_products(), schema)


@pytest.fixture(scope="session")
def order_items_parquet(tmp_path_factory: pytest.TempPathFactory) -> str:
    schema = pa.schema(
        [("order_id", pa.int64()), ("product_id", pa.int64()), ("quantity", pa.int64())]
    )
    return _write(tmp_path_factory, "order_items", make_order_items(), schema)


@pytest.fixture(scope="session")
def struct_users_parquet(tmp_path_factory: pytest.TempPathFactory) -> str:
    schema = pa.schema(
        [
            ("id", pa.int64()),
            ("name", pa.string()),
            ("address", pa.struct([("street", pa.string()), ("city", pa.string())])),
        ]
    )
    return _write(tmp_path_factory, "struct_users", make_struct_users(), schema)


@pytest.fixture(scope="session")
def list_users_parquet(tmp_path_factory: pytest.TempPathFactory) -> str:
    schema = pa.schema(
        [
            ("id", pa.int64()),
            ("name", pa.string()),
            ("tags", pa.list_(pa.string())),
            ("scores", pa.list_(pa.float64())),
        ]
    )
    return _write(tmp_path_factory, "list_users", make_list_users(), schema)


@pytest.fixture(scope="session")
def nullable_users_parquet(tmp_path_factory: pytest.TempPathFactory) -> str:
    schema = pa.schema(
        [("id", pa.int64()), ("name", pa.string()), ("age", pa.int64()), ("score", pa.float64())]
    )
    return _write(tmp_path_factory, "nullable_users", make_nullable_users(), schema)
