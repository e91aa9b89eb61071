"""Dump .explain("formatted") for named bench queries into
plans/r13/<query>_<tag>.txt (tag = before/after) — the optimization
round's plan evidence. Usage:

    python scripts/dump_r13_plans.py before [query ...]

With no query names: every non-streaming bench/bench2/bench3 query.
Streaming queries execute through a memory sink whose post-hoc batch
plan carries no information (see dump_plans.py) — skipped unless named
explicitly.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"


def main() -> None:
    from cdc_via_flink_spark.plans.registry import load_all
    from cdc_via_flink_spark.session import get_spark

    tag = sys.argv[1]
    names = sys.argv[2:]
    specs = load_all()
    if not names:
        names = sorted(
            n
            for n, s in specs.items()
            if (s.bench or s.bench2 or s.bench3) and not n.startswith("stream_")
        )
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-r13-plans", cpus=8)
    for name in names:
        df = specs[name].fn(spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        plan = re.sub(r"#\d+L?", "#x", plan)
        plan = re.sub(r"plan_id=\d+", "plan_id=x", plan)
        plan = re.sub(r"\[file:[^\]]+\]", "[file:...]", plan)
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
