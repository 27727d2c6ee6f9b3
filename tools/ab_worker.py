"""A/B bench worker: loads the engine from the tree given as argv[1],
reads query names on stdin (one per line), runs each into the noop sink,
prints `<name> <seconds>` on stdout (flushed) after each.

The parent interleaves two workers (old/new tree) so machine drift hits
both sides of every comparison equally.
"""
import sys
import time

tree = sys.argv[1]
sys.path.insert(0, tree)

from azure_func_forem_data_etl_spark.plans.registry import load_all  # noqa: E402
from azure_func_forem_data_etl_spark.session import get_spark  # noqa: E402

registry = load_all()
spark = get_spark(
    app_name=f"ab-{tree.replace('/', '_')}",
    extra_conf={"spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024)},
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1).collect()
print("READY", flush=True)

for line in sys.stdin:
    name = line.strip()
    if not name:
        continue
    if name == "QUIT":
        break
    q = registry.get(name)
    if q is None:
        print(f"{name} -1", flush=True)
        continue
    t0 = time.perf_counter()
    try:
        q.fn(spark, "/root/testdata/sf0.1").write.format("noop").mode(
            "overwrite"
        ).save()
        print(f"{name} {time.perf_counter() - t0:.3f}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name} ERR {e!r}", flush=True)

spark.stop()
