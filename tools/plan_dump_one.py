"""Dump the normalized executedPlan string for named queries.

Usage: python tools/plan_dump_one.py <sf_dir> <outdir> name[,name...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qucosa_fcrepo_reportingdb_spark.session import get_spark  # noqa: E402
from tools.plan_hashes import normalize  # noqa: E402


def main() -> None:
    sf_dir, outdir, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    import __spark_entry__ as em

    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        plan = (qs[name](spark, sf_dir)._jdf.queryExecution()
                .executedPlan().toString())
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(normalize(plan))
        print("wrote", name)


if __name__ == "__main__":
    main()
