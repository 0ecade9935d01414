"""Schema evolution for merge-on-read scans.

Iceberg tables evolve: columns get added, renamed, and type-widened,
and data files written under OLD schema versions must still read
correctly under the CURRENT request schema (Iceberg spec, "Schema
Evolution"; the reference carries the current schema on every rewrite
request — core/proto/iceberg.proto Schema message — and resolves file
columns against it by field id).

Spark-first mapping of the spec's three evolution forms:

- **add column**: old files lack the column → rows surface NULL.  The
  enforced-schema Parquet scan does this natively.
- **widening promotion** (``int → long``, ``float → double``,
  ``decimal(P,S) → decimal(P',S)`` with ``P' ≥ P``): Spark 4's
  vectorized Parquet reader performs exactly these widening reads when
  the requested schema is wider than the footer type.  We VALIDATE the
  promotion against the file footers before scanning, because the
  reader is *more* permissive than the Iceberg spec in ways that can
  silently corrupt (e.g. reading a ``decimal(5,2)`` file under an
  ``int`` request schema yields the unscaled integer: 1.25 → 125).
- **rename**: Iceberg resolves by field id; for Parquet files without
  embedded field ids the spec's fallback is a *name mapping*
  (``schema.name-mapping.default``) listing each field's historical
  names.  ``RewriteFilesRequest.name_mapping`` is that mapping:
  ``{current_name: [prior_name, ...]}``.  The scan then reads with
  Parquet schema merging and projects
  ``coalesce(current, cast(prior, current_type))`` — distributed,
  no per-file driver loop in the data path.

Footer validation is driver-side planning I/O (a few ms per file via
the pyarrow footer reader) — the same planning-time metadata pass
Iceberg spends reading manifests.  It only runs for local paths; for
object-store URIs the manifest/catalog layer is the right owner of
schema checks, and the scan itself still fails loudly on any
non-widening mismatch (only the decimal→int corruption case needs the
pre-check, and catalog-managed tables never issue it).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.types import (
    DataType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StructType,
)


def is_promotable(src: DataType, dst: DataType) -> bool:
    """True iff reading ``src``-typed file data under a ``dst``-typed
    request column is identical or an Iceberg-spec widening promotion."""
    if src == dst:
        return True
    if isinstance(src, IntegerType) and isinstance(dst, LongType):
        return True
    if isinstance(src, FloatType) and isinstance(dst, DoubleType):
        return True
    if isinstance(src, DecimalType) and isinstance(dst, DecimalType):
        return dst.scale == src.scale and dst.precision >= src.precision
    return False


def _aliases(name_mapping: dict[str, list[str]] | None, current: str) -> list[str]:
    return list((name_mapping or {}).get(current, []))


def evolved_projection(
    physical: StructType,
    request_schema: StructType,
    name_mapping: dict[str, list[str]] | None,
) -> list:
    """Columns projecting a (possibly schema-merged) physical scan onto
    the request schema: current-name first, historical names as
    fallbacks, widening casts applied, absent columns null-filled.

    ``coalesce`` is safe under rename because a single file never
    contains BOTH the current and a prior name for one field (a rename
    replaces the name); in merged scans the non-matching column is NULL
    for every row of the other generation's files.
    """
    phys = {f.name: f.dataType for f in physical.fields}
    cols = []
    for field in request_schema.fields:
        present = [
            n for n in [field.name, *_aliases(name_mapping, field.name)] if n in phys
        ]
        for n in present:
            if not is_promotable(phys[n], field.dataType):
                raise ValueError(
                    f"schema evolution: column '{n}' has file type "
                    f"{phys[n].simpleString()}, not promotable to requested "
                    f"{field.dataType.simpleString()} for field '{field.name}' "
                    "(Iceberg allows int->long, float->double, and decimal "
                    "precision widening at equal scale)"
                )
        if not present:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
        elif len(present) == 1:
            cols.append(F.col(present[0]).cast(field.dataType).alias(field.name))
        else:
            cols.append(
                F.coalesce(
                    *[F.col(n).cast(field.dataType) for n in present]
                ).alias(field.name)
            )
    return cols


def _local_path(path: str) -> str | None:
    """Filesystem path for local files; None for object-store URIs."""
    if path.startswith("file://"):
        return path[len("file://"):]
    if "://" not in path:
        return path
    return None


def validate_file_schemas(
    paths: list[str],
    request_schema: StructType,
    name_mapping: dict[str, list[str]] | None = None,
) -> None:
    """Reject non-widening type changes BEFORE the scan runs.

    Reads each local file's Parquet footer (pyarrow, driver-side
    planning I/O) and checks every request field that resolves to a
    physical column for spec-legal promotion.  Object-store URIs are
    skipped (see module docstring).
    """
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_type

    import os as _os

    expanded: list[str] = []
    for path in paths:
        local = _local_path(path)
        if local is None:
            continue
        if _os.path.isdir(local):  # tasks may reference a directory write
            expanded.extend(
                _os.path.join(local, n)
                for n in sorted(_os.listdir(local))
                if n.endswith(".parquet")
            )
        else:
            expanded.append(local)
    for local in expanded:
        footer = pq.read_schema(local)
        phys: dict[str, DataType] = {}
        for i, name in enumerate(footer.names):
            try:
                phys[name] = from_arrow_type(footer.types[i])
            except Exception:
                continue  # exotic arrow type: let the scan decide
        from pyspark.sql.types import TimestampNTZType, TimestampType

        def footer_ambiguous(src: DataType, dst: DataType) -> bool:
            # A Parquet timestamp column maps to TIMESTAMP or
            # TIMESTAMP_NTZ depending on isAdjustedToUTC + session conf;
            # the arrow-footer view can't distinguish how Spark will
            # read it — not a corruption case, leave it to the scan.
            ts = (TimestampType, TimestampNTZType)
            return isinstance(src, ts) and isinstance(dst, ts)

        for field in request_schema.fields:
            for n in [field.name, *_aliases(name_mapping, field.name)]:
                if (
                    n in phys
                    and not is_promotable(phys[n], field.dataType)
                    and not footer_ambiguous(phys[n], field.dataType)
                ):
                    raise ValueError(
                        f"schema evolution: file {local} column '{n}' has type "
                        f"{phys[n].simpleString()}, not promotable to requested "
                        f"{field.dataType.simpleString()} for field "
                        f"'{field.name}'"
                    )
