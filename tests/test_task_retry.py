"""E3 (task-panic isolation, SURVEY §2): a task that dies on its FIRST
attempt must not kill the job — Spark reschedules the task
(``spark.task.maxFailures``) and the result is identical to an undisturbed
run. The reference isolates a panicking per-URL task inside its tokio
worker (src/main.rs task spawn/join error arm); the Spark analog is task
re-execution, which this exercises END-TO-END: an Arrow pandas UDF (the
same kernel family as the extraction UDFs) raises on attempt 0 of one
partition and succeeds on the retry.

Runs in a subprocess because retries need ``local[N, maxFailures]`` and the
shared session fixture is plain ``local[4]`` (maxFailures=1, where any task
failure is fatal — asserted here too, so the isolation is attributable to
the retry policy, not to Spark swallowing the error).
"""

import json
import subprocess
import sys

_BODY = '''
import json
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

@pandas_udf(StringType())
def flaky_upper(s: pd.Series) -> pd.Series:
    tc = TaskContext.get()
    if tc is not None and tc.partitionId() == 0 and tc.attemptNumber() == 0:
        raise RuntimeError("injected task panic (attempt 0)")
    return s.str.upper()

spark = (SparkSession.builder.master("%(master)s")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
df = spark.createDataFrame([(i, "url%%d" %% i) for i in range(20)],
                           "id LONG, u STRING")
try:
    vals = sorted(r["v"] for r in df.repartition(4)
                  .select(flaky_upper("u").alias("v")).collect())
    print("RESULT:" + json.dumps(vals))
except Exception:
    print("RESULT:" + json.dumps("job failed"))
spark.stop()
'''


def _run(master: str):
    p = subprocess.run([sys.executable, "-c", _BODY % {"master": master}],
                       capture_output=True, text=True, timeout=600)
    assert p.returncode == 0, p.stderr[-2000:]
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("RESULT:")][-1]
    return json.loads(line[len("RESULT:"):])


def test_task_panic_isolated_by_retry():
    out = _run("local[2, 3]")
    assert out == sorted("URL%d" % i for i in range(20))


def test_without_retries_the_same_panic_is_fatal():
    assert _run("local[2]") == "job failed"
