"""Object-store FileIO configuration — the reference's ``FileIoBuilder``
(``core/proto/iceberg.proto:129-132``, decoded at
``core/src/parser/proto.rs:93-98``) carries an Iceberg FileIO scheme +
property map (S3/GCS endpoints and credentials) alongside each rewrite
request.

Spark reads object stores through the Hadoop filesystem layer, so the
analog is mapping Iceberg FileIO property names onto the corresponding
``fs.s3a.*`` / ``fs.gs.*`` Hadoop configuration keys on the session.
The mapping itself is exercised by tests; actually reaching S3 needs
the hadoop-aws jar on the cluster classpath (not bundled here — the
same deployment step any Spark-on-S3 job requires).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# Iceberg FileIO property → Hadoop conf key (S3A / GCS connectors).
_S3_PROPS = {
    "s3.endpoint": "fs.s3a.endpoint",
    "s3.access-key-id": "fs.s3a.access.key",
    "s3.secret-access-key": "fs.s3a.secret.key",
    "s3.session-token": "fs.s3a.session.token",
    "s3.region": "fs.s3a.endpoint.region",
    "s3.path-style-access": "fs.s3a.path.style.access",
    "s3.connect-timeout": "fs.s3a.connection.timeout",
    "client.region": "fs.s3a.endpoint.region",
}
_GCS_PROPS = {
    "gcs.project-id": "fs.gs.project.id",
    # gcs.oauth2.token deliberately has NO Hadoop mapping: the GCS
    # connector's fs.gs.auth.access.token.provider expects an
    # AccessTokenProvider CLASS NAME, so mapping the raw bearer token
    # onto it made the connector Class.forName the token and fail —
    # while leaking the credential into a config slot (r9 review
    # find).  The pyarrow path (arrow_filesystem) carries the token
    # correctly; Hadoop-routed GCS needs a deployed provider class,
    # which a property value cannot express.
    "gcs.oauth2.token": None,
}


def apply_file_io(
    spark: SparkSession, scheme: str, props: dict[str, str]
) -> dict[str, str]:
    """Apply FileIO properties to the session's Hadoop configuration.

    Known Iceberg property names map to their connector key; unknown
    ones pass through under ``fs.<scheme>.`` so connector-specific
    extras still reach the filesystem.  Returns the applied mapping.
    """
    table = {**_S3_PROPS, **_GCS_PROPS}
    applied: dict[str, str] = {}
    hconf = spark.sparkContext._jsc.hadoopConfiguration()  # noqa: SLF001
    for key, value in props.items():
        hkey = table.get(key, f"fs.{scheme}.{key}") if scheme else table.get(key)
        if hkey is None:
            continue
        hconf.set(hkey, value)
        applied[hkey] = value
    return applied


def overwrite_dir(spark: SparkSession, path: str) -> None:
    """Recreate ``path`` empty through the Hadoop filesystem layer —
    the same listing-independent overwrite posture Spark's own
    ``mode("overwrite")`` gives the parquet writer, valid for any
    configured Hadoop FS (``file:``, ``s3a:``, ``gs:``, ...), not just
    the local filesystem.  This is the one seam non-parquet data-file
    writes touch the filesystem from the driver."""
    jvm = spark.sparkContext._jvm  # noqa: SLF001
    hconf = spark.sparkContext._jsc.hadoopConfiguration()  # noqa: SLF001
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    if fs.exists(p):
        fs.delete(p, True)
    fs.mkdirs(p)


def local_write_path(path: str) -> str:
    """Executor-side path resolution for the Python codec writers
    (Avro container / pyarrow ORC), which write through ``open()``:
    ``file:`` URIs map to their filesystem path; any other scheme is an
    explicit gate — those writers would need a pyarrow.fs output stream
    (documented operating limit), and a silent local write to a path
    named ``s3a://...`` would be data loss."""
    import re

    if path.startswith("file:"):
        from urllib.parse import unquote, urlparse

        parsed = urlparse(path)
        return unquote(parsed.path)
    # Hadoop Paths accept single-slash URIs too ('hdfs:/warehouse/t'),
    # so gate on ANY scheme prefix, not just '://' — a bypassed gate
    # here means overwrite_dir wipes the remote directory while the
    # executors write to a local dir literally named 'hdfs:'.
    if re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*:", path):
        raise NotImplementedError(
            f"avro/orc data-file writes support local and file: paths; "
            f"got scheme {path.split(':', 1)[0]!r} (the parquet path "
            "writes through Hadoop FS and supports any configured store)"
        )
    return path


def arrow_filesystem(dir_path: str, file_io: dict | None = None):
    """Resolve ``(pyarrow.fs.FileSystem | None, path-within-fs)`` for
    the executor-side Avro/ORC codec writers — the remote analog of
    the Hadoop layer Spark's parquet writer gets for free.

    - Plain and ``file:`` paths return ``(None, local_path)``: the
      writers keep their direct-``open()`` fast path.
    - ``s3://`` / ``gs://`` construct pyarrow's own connectors, with
      credentials threaded from the reference's FileIoBuilder property
      names (the same dict ``apply_file_io`` maps onto Hadoop conf for
      the parquet path).  Construction is offline; IO happens on the
      executors at write time.
    - A ``file_io`` dict may inject a ready ``pyarrow_filesystem``
      (any picklable pyarrow FileSystem — tests use SubTreeFileSystem
      to emulate a remote store with object-store semantics).
    - Anything else (``hdfs:`` needs libhdfs, unknown schemes) raises
      the same explicit gate as before.
    """
    import re

    props = (file_io or {}).get("props", {}) if file_io else {}
    injected = (file_io or {}).get("pyarrow_filesystem")
    if injected is not None:
        return injected, dir_path
    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*):", dir_path)
    scheme = m.group(1).lower() if m else None
    if scheme in (None, "file"):
        return None, local_write_path(dir_path)
    from urllib.parse import urlparse

    parsed = urlparse(dir_path)
    inner = parsed.netloc + parsed.path
    if scheme in ("s3", "s3a"):
        from pyarrow import fs as pafs

        kw = {}
        if props.get("s3.endpoint"):
            kw["endpoint_override"] = props["s3.endpoint"]
        if props.get("s3.access-key-id"):
            kw["access_key"] = props["s3.access-key-id"]
        if props.get("s3.secret-access-key"):
            kw["secret_key"] = props["s3.secret-access-key"]
        if props.get("s3.session-token"):
            kw["session_token"] = props["s3.session-token"]
        region = props.get("s3.region") or props.get("client.region")
        if region:
            kw["region"] = region
        # pyarrow defaults to path-style whenever endpoint_override is
        # set, so path-style-access=true needs no flag; the property's
        # meaningful direction is FALSE (Iceberg's spelling for
        # virtual-hosted addressing against a custom endpoint).
        if str(props.get("s3.path-style-access", "")).lower() == "false":
            kw["force_virtual_addressing"] = True
        return pafs.S3FileSystem(**kw), inner
    if scheme in ("gs", "gcs"):
        from pyarrow import fs as pafs

        kw = {}
        if props.get("gcs.oauth2.token"):
            # pyarrow requires an expiration alongside a bearer token;
            # Iceberg spells it gcs.oauth2.token-expires-at (epoch ms).
            import datetime as _dt

            kw["access_token"] = props["gcs.oauth2.token"]
            exp_ms = props.get("gcs.oauth2.token-expires-at")
            kw["credential_token_expiration"] = (
                _dt.datetime.fromtimestamp(
                    int(exp_ms) / 1000, tz=_dt.timezone.utc
                )
                if exp_ms
                else _dt.datetime.now(tz=_dt.timezone.utc)
                + _dt.timedelta(hours=1)
            )
        if props.get("gcs.project-id"):
            kw["project_id"] = props["gcs.project-id"]
        return pafs.GcsFileSystem(**kw), inner
    raise NotImplementedError(
        f"avro/orc data-file writes support local, file:, s3:, and gs: "
        f"paths; got scheme {scheme!r} (the parquet path writes through "
        "Hadoop FS and supports any configured store)"
    )


def display_base(dir_path: str, file_io: dict | None = None) -> str:
    """The base spelling the writer's metadata paths are rooted at —
    WITHOUT constructing a filesystem connector: local/file: paths
    resolve to the filesystem path (their written files are local
    spellings); injected-FS and s3:/gs: paths keep the caller's
    spelling.  Mirrors arrow_filesystem's routing decision."""
    import re

    if file_io and file_io.get("pyarrow_filesystem") is not None:
        return dir_path.rstrip("/")
    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*):", dir_path)
    if m is None or m.group(1).lower() == "file":
        return local_write_path(dir_path).rstrip("/")
    return dir_path.rstrip("/")
