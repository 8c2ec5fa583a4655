"""Measure the reference library's single-core compress/expand throughput.

The reference (`biopragmatics/curies`) publishes no benchmark numbers
(BASELINE.md), so this tool produces the per-core baseline our engine
must match-or-beat: ops/sec of `Converter.compress` (trie longest-prefix
match, reference api.py:1732-1778 over api.py:3331-3347) and
`Converter.expand` (dict probe + concat, api.py:1949-1983), in-process
CPython, single thread, on the same derived strings bench.py feeds the
Spark engine.

Prints one JSON line. The reference is imported read-only with a
`pystow` stub (not installed here; only needed for file I/O helpers this
bench never calls).
"""

from __future__ import annotations

import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_reference():
    pystow = types.ModuleType("pystow")
    utils = types.ModuleType("pystow.utils")
    utils.safe_open_reader = lambda *a, **k: None
    utils.safe_open_writer = lambda *a, **k: None
    pystow.utils = utils
    sys.modules.setdefault("pystow", pystow)
    sys.modules.setdefault("pystow.utils", utils)
    sys.path.insert(0, "/root/reference/src")
    import curies

    return curies


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import duckdb

    from curies_spark.plans.demo import CURIE_EXPR, DEMO_EPM, URI_EXPR

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf_dir}/lineitem.parquet')"
    )
    uris = [r[0] for r in con.execute(f"SELECT {URI_EXPR} FROM lineitem").fetchall()]
    curies_list = [
        r[0] for r in con.execute(f"SELECT {CURIE_EXPR} FROM lineitem").fetchall()
    ]

    reference = _load_reference()
    converter = reference.Converter.from_extended_prefix_map(DEMO_EPM)

    compress = converter.compress
    t0 = time.perf_counter()
    for uri in uris:
        compress(uri)
    compress_sec = time.perf_counter() - t0

    expand = converter.expand
    t0 = time.perf_counter()
    for curie in curies_list:
        expand(curie)
    expand_sec = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "metric": "reference_single_core_ops_per_sec",
                "rows": len(uris),
                "compress_sec": round(compress_sec, 3),
                "expand_sec": round(expand_sec, 3),
                "compress_ops_per_sec": int(len(uris) / compress_sec),
                "expand_ops_per_sec": int(len(curies_list) / expand_sec),
                "combined_ops_per_sec": int(
                    (len(uris) + len(curies_list)) / (compress_sec + expand_sec)
                ),
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
