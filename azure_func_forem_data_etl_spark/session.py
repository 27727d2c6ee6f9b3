"""SparkSession construction.

The reference validates config + builds its blob client eagerly at module
import (fetch_articles.py:21-30); our equivalent is a single tuned session
build per driver.  All defaults are chosen for the 100 TB design point and
scale *down* to local[32] testing:

- AQE on: runtime coalescing, skew-join splitting, join re-planning.
- UTC session timezone: the reference does all timestamp math in UTC
  (fetch_articles.py:124-125); deterministic cross-engine comparison
  requires it.
- Arrow on: every Pandas UDF path transfers columnar batches.
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from collections.abc import Mapping
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


@dataclass(frozen=True)
class StorageConfig:
    """Cloud-storage credentials, validated eagerly at session build.

    The reference refuses to start when ``BLOB_CONN_STR`` is unset — its
    blob client is constructed at module import and raises immediately
    (fetch_articles.py:21-30).  This is the Spark analog: pass a
    ``StorageConfig`` to :func:`get_spark` and a missing/empty required
    setting fails at session build, not as an opaque task failure
    mid-job hours into a 100 TB run.

    ``settings`` are applied as Hadoop configs (``spark.hadoop.`` prefix).
    Recipes:

    - **abfss** (Azure Data Lake Gen2)::

        StorageConfig(scheme="abfss", settings={
            "fs.azure.account.key.ACCT.dfs.core.windows.net": key})

    - **s3a**::

        StorageConfig(scheme="s3a", settings={
            "fs.s3a.access.key": ak, "fs.s3a.secret.key": sk})
        # or role/instance-profile auth:
        StorageConfig(scheme="s3a", settings={
            "fs.s3a.aws.credentials.provider":
                "com.amazonaws.auth.InstanceProfileCredentialsProvider"},
            required=("fs.s3a.aws.credentials.provider",))

    ``required`` defaults to every key in ``settings`` (all must be
    non-empty); pass a subset to relax.
    """

    scheme: str
    settings: Mapping[str, str] = field(default_factory=dict)
    required: tuple[str, ...] | None = None

    def validate(self) -> None:
        keys = tuple(self.settings) if self.required is None else self.required
        missing = [k for k in keys if not (self.settings.get(k) or "").strip()]
        if not self.settings:
            missing = [f"<no settings for scheme {self.scheme!r}>"]
        if missing:
            raise ValueError(
                f"storage config for scheme {self.scheme!r} is missing required "
                f"settings: {missing} — refusing to build a session that would "
                "fail at first read/write (reference parity: fetch_articles.py:21-30)"
            )

_SHIPPED_APPS: set[str] = set()
_SHIP_LOCK = __import__("threading").Lock()


def ship_package(spark: SparkSession) -> None:
    """Make this package importable on executors regardless of driver cwd.

    Queries using mapInPandas/pandas UDFs pickle closures that reference
    module-level helpers by import path; Python workers must be able to
    ``import azure_func_forem_data_etl_spark``.  On a real cluster this is
    the wheel you ship with spark-submit; here we zip the package once per
    session and ``addPyFile`` it.

    Thread-safe (r14): concurrent driver threads (guide §2.6) must not
    both build the zip — executors verify a fetched file's bytes against
    the driver copy, and a re-written zip (fresh zipfile timestamps)
    fails EVERY subsequent task with "exists and does not match
    contents".  The zip is built under a lock, written to a temp name and
    atomically renamed.
    """
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED_APPS:
        return
    with _SHIP_LOCK:
        if app_id in _SHIPPED_APPS:
            return
        pkg_root = Path(__file__).resolve().parent
        zip_path = Path(tempfile.gettempdir()) / f"forem_etl_pkg_{os.getpid()}.zip"
        if not zip_path.exists():
            tmp = zip_path.with_suffix(f".tmp{os.getpid()}.{id(spark)}")
            with zipfile.ZipFile(tmp, "w") as zf:
                for py in sorted(pkg_root.rglob("*.py")):
                    zf.write(
                        py, arcname=f"{pkg_root.name}/{py.relative_to(pkg_root)}"
                    )
            os.replace(tmp, zip_path)
        spark.sparkContext.addPyFile(str(zip_path))
        _SHIPPED_APPS.add(app_id)


def get_spark(
    app_name: str = "forem-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    storage: StorageConfig | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``storage`` is validated eagerly (C3 parity: fail at build, not
    mid-job) and its settings applied as ``spark.hadoop.*`` configs.
    """
    if storage is not None:
        storage.validate()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    if storage is not None:
        for k, v in storage.settings.items():
            builder = builder.config(f"spark.hadoop.{k}", v)
    session = builder.getOrCreate()
    if storage is not None:
        # getOrCreate may have REUSED an existing SparkContext, whose Hadoop
        # configuration was frozen at startup — builder configs never reach
        # it.  Apply the storage settings onto the live Hadoop conf too so
        # attaching credentials to an existing session works instead of
        # silently failing at first read/write.  Idempotent for new sessions.
        hconf = session.sparkContext._jsc.hadoopConfiguration()
        for k, v in storage.settings.items():
            hconf.set(k, v)
    return session


def ensure_query_session_conf(spark: SparkSession) -> None:
    """Make a caller-provided session deterministic for oracle comparison.

    The correctness driver runs our queries under *its* session; timestamps
    only hash-match DuckDB when rendered in UTC, so set the (runtime
    mutable) session timezone defensively.  Idempotent and cheap.

    ``nanosAsLong``: the events table stores TIMESTAMP(NANOS) parquet,
    which Spark otherwise refuses ([PARQUET_TYPE_ILLEGAL]).  We read the
    raw int64 nanos and truncate to microseconds in the loader — exactly
    what DuckDB's parquet reader does natively — so both engines see
    identical µs values.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Right-size shuffle/state partitioning for a caller session still on
    # the global default (200).  AQE coalesces batch shuffles at runtime,
    # but STREAMING state partitioning is fixed at query start — a
    # stream-stream join under 200 state-store partitions on a laptop-class
    # runner pays ~25x state-maintenance overhead (observed 45 s -> ~2 s for
    # streaming_interval_join at sf0.01).  An explicit setting — via
    # builder/spark-submit conf (visible in the SparkConf) or a value we
    # didn't write ourselves — is the caller's sizing decision; leave it
    # alone.  The value-equals-"200" sniff alone can't distinguish an
    # explicit 200, so both signals gate the override.
    #
    # The SparkConf sniff clones the whole context conf over py4j (~20 ms);
    # the context conf is FROZEN once the SparkContext starts, so the
    # decision is memoized per application (r14, guide §1.2).  The
    # runtime `spark.conf` value stays un-memoized: re-checked each call
    # so a caller that later sets 200 explicitly at session level keeps
    # its value only if the sniff says it was their choice at build time.
    app_id = spark.sparkContext.applicationId
    explicitly_set = _SHUFFLE_CONF_EXPLICIT.get(app_id)
    if explicitly_set is None:
        explicitly_set = spark.sparkContext.getConf().contains(
            "spark.sql.shuffle.partitions"
        )
        _SHUFFLE_CONF_EXPLICIT[app_id] = explicitly_set
    if (
        not explicitly_set
        and spark.conf.get("spark.sql.shuffle.partitions", "200") == "200"
    ):
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(max(8, spark.sparkContext.defaultParallelism)),
        )
    ship_package(spark)


_SHUFFLE_CONF_EXPLICIT: dict[str, bool] = {}
