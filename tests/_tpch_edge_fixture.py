import pandas as pd


def _pq(pdf, path):
    # pandas defaults to TIMESTAMP(NANOS), which Spark's reader rejects —
    # write through pyarrow coerced to micros (the driver testdata format)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        path,
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )


def write_tpch_edge(d):
    """Minimal consistent TPC-H-shaped tables with edge rows: a region with
    no nations, a nation with no customers, a customer with no orders, an
    order with no lineitems, boundary dates/prices exactly on filter
    constants, 100%% discounts, zero prices, orphan foreign keys."""
    pd.DataFrame(
        [
            {"r_regionkey": 0, "r_name": "AMERICA"},
            {"r_regionkey": 1, "r_name": "EMPTYREG"},
        ]
    ).astype({"r_regionkey": "int32"}).pipe(_pq, f"{d}/region.parquet")
    pd.DataFrame(
        [
            {"n_nationkey": 0, "n_name": "ALPHA", "n_regionkey": 0},
            {"n_nationkey": 1, "n_name": "BETA", "n_regionkey": 0},
            {"n_nationkey": 2, "n_name": "GAMMA", "n_regionkey": 0},
        ]
    ).astype({"n_nationkey": "int32", "n_regionkey": "int32"}).pipe(_pq, f"{d}/nation.parquet")
    pd.DataFrame(
        [
            {"c_custkey": 1, "c_name": "Cust#1", "c_nationkey": 0,
             "c_acctbal": 100.0, "c_mktsegment": "BUILDING"},
            {"c_custkey": 2, "c_name": "Cust#2", "c_nationkey": 0,
             "c_acctbal": -50.25, "c_mktsegment": "AUTOMOBILE"},
            {"c_custkey": 3, "c_name": "Cust#3", "c_nationkey": 1,
             "c_acctbal": 0.0, "c_mktsegment": "BUILDING"},
        ]
    ).astype({"c_nationkey": "int32"}).pipe(_pq, f"{d}/customer.parquet")
    pd.DataFrame(
        [
            {"s_suppkey": 1, "s_name": "Supp#1", "s_nationkey": 0, "s_acctbal": 10.5},
            {"s_suppkey": 2, "s_name": "Supp#2", "s_nationkey": 0, "s_acctbal": 0.0},
            {"s_suppkey": 3, "s_name": "Supp#3", "s_nationkey": 1, "s_acctbal": -5.0},
        ]
    ).astype({"s_nationkey": "int32"}).pipe(_pq, f"{d}/supplier.parquet")
    pd.DataFrame(
        [
            {"p_partkey": 1, "p_name": "green metal thing", "p_brand": "Brand#1",
             "p_type": "TYPEA", "p_size": 1, "p_retailprice": 950.0},
            {"p_partkey": 2, "p_name": "blue item", "p_brand": "Brand#2",
             "p_type": "TYPEB", "p_size": 12, "p_retailprice": 980.0},
            {"p_partkey": 3, "p_name": "other green", "p_brand": "Brand#1",
             "p_type": "TYPEC", "p_size": 7, "p_retailprice": 990.0},
            {"p_partkey": 4, "p_name": "plain", "p_brand": "Brand#3",
             "p_type": "TYPEA", "p_size": 5, "p_retailprice": 100.0},
        ]
    ).astype({"p_size": "int32"}).pipe(_pq, f"{d}/part.parquet")
    pd.DataFrame(
        [
            {"o_orderkey": 100, "o_custkey": 1, "o_orderstatus": "F",
             "o_totalprice": 1500.0, "o_orderdate": pd.Timestamp("1998-12-31"),
             "o_orderpriority": "1-URGENT"},
            {"o_orderkey": 101, "o_custkey": 1, "o_orderstatus": "O",
             "o_totalprice": 500000.0, "o_orderdate": pd.Timestamp("1999-01-01"),
             "o_orderpriority": "3-MEDIUM"},
            {"o_orderkey": 102, "o_custkey": 2, "o_orderstatus": "F",
             "o_totalprice": 999.99, "o_orderdate": pd.Timestamp("1999-06-15"),
             "o_orderpriority": "2-HIGH"},
            {"o_orderkey": 103, "o_custkey": 1, "o_orderstatus": "P",
             "o_totalprice": 450000.0, "o_orderdate": pd.Timestamp("1997-05-05"),
             "o_orderpriority": "5-LOW"},
            {"o_orderkey": 104, "o_custkey": 2, "o_orderstatus": "F",
             "o_totalprice": 0.0, "o_orderdate": pd.Timestamp("1998-01-01"),
             "o_orderpriority": "4-NOT"},
            {"o_orderkey": 105, "o_custkey": 1, "o_orderstatus": "O",
             "o_totalprice": 1.0, "o_orderdate": pd.Timestamp("1999-02-02"),
             "o_orderpriority": "1-URGENT"},
        ]
    ).pipe(_pq, f"{d}/orders.parquet")
    li = []

    def line(ok, pk, sk, ln, qty, price, disc, tax, rf, ls, ship):
        li.append({"l_orderkey": ok, "l_partkey": pk, "l_suppkey": sk,
                   "l_linenumber": ln, "l_quantity": qty,
                   "l_extendedprice": price, "l_discount": disc, "l_tax": tax,
                   "l_returnflag": rf, "l_linestatus": ls,
                   "l_shipdate": pd.Timestamp(ship)})

    line(100, 1, 1, 1, 5.0, 1000.0, 0.05, 0.05, "R", "F", "1999-01-01")
    line(100, 2, 2, 2, 1.0, 200.0, 0.0, 0.08, "N", "O", "1999-03-02")
    line(101, 3, 3, 1, 50.0, 400000.0, 1.0, 0.0, "A", "F", "1999-02-01")
    line(101, 1, 1, 2, 2.5, 100000.0, 0.1, 0.02, "R", "F", "1998-12-31")
    line(102, 99, 1, 1, 3.0, 750.0, 0.02, 0.05, "N", "O", "1999-07-01")
    line(103, 4, 2, 1, 10.0, 450000.0, 0.0, 0.07, "A", "F", "1997-06-01")
    line(104, 2, 3, 1, 0.0, 0.0, 0.0, 0.0, "R", "F", "1998-02-01")
    pd.DataFrame(li).astype({"l_linenumber": "int32"}).pipe(_pq, f"{d}/lineitem.parquet")
