"""Dump `.explain("formatted")` of named queries to files.

Usage: python tools/explain_one.py <out_dir> <suffix> <sf_dir> query...
Writes <out_dir>/<query>_<suffix>.txt for each query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from app_fastdata_spark.catalog import queries
from app_fastdata_spark.session import get_spark


def main() -> None:
    out_dir, suffix, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain_one")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(path)
    spark.stop()


if __name__ == "__main__":
    main()
