"""Every package module must import without an active SparkContext:
a spark-submit driver imports the plans/operators it needs BEFORE
calling SparkSession.builder.getOrCreate(), so module-level Column
construction (e.g. F.lit at import time) is a crash in the normal
import order. Regression for the _BIT_MASKS incident: a module-level
F.array(F.lit(...)) in operators/contamination.py broke
`import htmlparser2_spark.plans.curate_job` on a cold interpreter.
"""

import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_all_modules_import_without_spark_context():
    pkg = REPO / "htmlparser2_spark"
    modules = sorted(
        ".".join(p.relative_to(REPO).with_suffix("").parts)
        for p in pkg.rglob("*.py")
        if p.name != "__init__.py"
    )
    assert modules, "package layout moved?"
    code = "import importlib\n" + "\n".join(
        f"importlib.import_module({m!r})" for m in modules
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
