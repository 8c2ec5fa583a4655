"""Generate sf1 testdata (~6M-row lineitem) by deterministic 10×
expansion of the driver's sf0.1 tables.

/root/testdata is read-only and tops out at sf0.1; the oracle gate one
decade up catches scale-dependent divergence (overflow, banding
degeneracy, quadratic blow-ups) sf0.1 cannot. Replica ``r`` of each row
offsets every key column by ``r * (max_key + 1)`` — the SAME offset
formula on both sides of every foreign key, so all join relationships
hold exactly. Non-key values are kept verbatim: value distributions
(URI/CURIE densities in ``events.props``, document text, embedding
vectors) match the driver's data, and identical replica texts/vectors
deliberately scale the exact-duplicate families 10× — the stress case
the dedup collapse exists for.

Written with DuckDB as ONE parquet file per table (the layout
``tools/check_oracle.py`` and ``queries()`` expect). Deterministic —
safe to regenerate. Usage::

    python tools/make_sf1.py [out_dir]        # default /tmp/curies_spark_sf1
    python tools/check_oracle.py /tmp/curies_spark_sf1
"""

from __future__ import annotations

import os
import sys

SRC = "/root/testdata/sf0.1"
DEFAULT_OUT = "/tmp/curies_spark_sf1"
REPLICAS = 10

#: per-table key columns to offset, as (column, key-domain table, key-domain column);
#: the domain row count determines the offset stride so replicas never collide
OFFSETS = {
    "region": [],
    "nation": [],
    "customer": [("c_custkey", "customer", "c_custkey")],
    "supplier": [("s_suppkey", "supplier", "s_suppkey")],
    "part": [("p_partkey", "part", "p_partkey")],
    "orders": [
        ("o_orderkey", "orders", "o_orderkey"),
        ("o_custkey", "customer", "c_custkey"),
    ],
    "lineitem": [
        ("l_orderkey", "orders", "o_orderkey"),
        ("l_partkey", "part", "p_partkey"),
        ("l_suppkey", "supplier", "s_suppkey"),
    ],
    "events": [
        ("event_id", "events", "event_id"),
        ("user_id", "events", "user_id"),
    ],
    "documents": [("doc_id", "documents", "doc_id")],
    "embeddings": [("vec_id", "embeddings", "vec_id")],
}


def main() -> None:
    import duckdb

    out = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_OUT
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    strides: dict[tuple[str, str], int] = {}
    for table, offs in OFFSETS.items():
        for _, dom_table, dom_col in offs:
            key = (dom_table, dom_col)
            if key not in strides:
                strides[key] = con.execute(
                    f"SELECT max({dom_col}) + 1 FROM '{SRC}/{dom_table}.parquet'"
                ).fetchone()[0]

    for table, offs in OFFSETS.items():
        src = f"'{SRC}/{table}.parquet'"
        dst = os.path.join(out, f"{table}.parquet")
        if not offs:  # pure dimension table: copy verbatim
            con.execute(f"COPY (SELECT * FROM {src}) TO '{dst}' (FORMAT PARQUET)")
            continue
        cols = [
            c[0]
            for c in con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()
        ]
        offset_by_col = {
            col: strides[(dt, dc)] for col, dt, dc in offs
        }
        select = ", ".join(
            f"{c} + r.range * {offset_by_col[c]} AS {c}" if c in offset_by_col else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {select} FROM {src}, range({REPLICAS}) r "
            f"ORDER BY {offs[0][0]}) TO '{dst}' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
