"""Typed schema declarations for the driver testdata tables
(/root/testdata/sf*/  — TPC-H-ish star schema + events/documents/embeddings;
see TESTDATA.md / FIXTURES.md §3). Shared by tests, __spark_entry__ and
bench.py.
"""

from __future__ import annotations

from colnade_spark.dtypes import Datetime, Float32, Float64, Int32, Int64, List, Utf8
from colnade_spark.schema import Column, Schema


class Region(Schema):
    r_regionkey: Column[Int32]
    r_name: Column[Utf8]


class Nation(Schema):
    n_nationkey: Column[Int32]
    n_name: Column[Utf8]
    n_regionkey: Column[Int32]


class Customer(Schema):
    c_custkey: Column[Int64]
    c_name: Column[Utf8]
    c_nationkey: Column[Int32]
    c_acctbal: Column[Float64]
    c_mktsegment: Column[Utf8]


class Supplier(Schema):
    s_suppkey: Column[Int64]
    s_name: Column[Utf8]
    s_nationkey: Column[Int32]
    s_acctbal: Column[Float64]


class Part(Schema):
    p_partkey: Column[Int64]
    p_name: Column[Utf8]
    p_brand: Column[Utf8]
    p_type: Column[Utf8]
    p_size: Column[Int32]
    p_retailprice: Column[Float64]


class Orders(Schema):
    o_orderkey: Column[Int64]
    o_custkey: Column[Int64]
    o_orderstatus: Column[Utf8]
    o_totalprice: Column[Float64]
    o_orderdate: Column[Datetime]
    o_orderpriority: Column[Utf8]


class Lineitem(Schema):
    l_orderkey: Column[Int64]
    l_partkey: Column[Int64]
    l_suppkey: Column[Int64]
    l_linenumber: Column[Int32]
    l_quantity: Column[Float64]
    l_extendedprice: Column[Float64]
    l_discount: Column[Float64]
    l_tax: Column[Float64]
    l_returnflag: Column[Utf8]
    l_linestatus: Column[Utf8]
    l_shipdate: Column[Datetime]


class Events(Schema):
    event_id: Column[Int64]
    ts: Column[Datetime]
    user_id: Column[Int64]
    event_type: Column[Utf8]
    value: Column[Float64]
    props: Column[Utf8]


class Documents(Schema):
    doc_id: Column[Int64]
    text: Column[Utf8]
    lang: Column[Utf8]
    source: Column[Utf8]
    n_chars: Column[Int64]


class Embeddings(Schema):
    vec_id: Column[Int64]
    embedding: Column[List[Float32]]
    label: Column[Int32]


TABLES: dict[str, type[Schema]] = {
    "region": Region,
    "nation": Nation,
    "customer": Customer,
    "supplier": Supplier,
    "part": Part,
    "orders": Orders,
    "lineitem": Lineitem,
    "events": Events,
    "documents": Documents,
    "embeddings": Embeddings,
}


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"
