"""raylake — a Ray-Data-native lakehouse table-maintenance engine.

Built from scratch (NOT an Iceberg/Spark port) with the capabilities the
reference repo (`manhtdxxx/batch-pipeline-via-lakehouse`, read-only at
/root/reference) obtains from Apache Iceberg 1.5 + PySpark 3.5:

- partitioned append with atomic snapshot commits (ref: src/elt/bronze/_bronze_handler.py:50-56)
- snapshot log + time travel (ref: notebooks/iceberg_curd/create_iceberg_table_by_trino.sql:19-43)
- incremental (snapshot-diff) scans (ref: src/elt/silver/_silver_handler.py:31-41)
- MERGE INTO upserts, SCD1/SCD2, null-safe change detection (ref: _silver_handler.py:156-224)
- small-file compaction, Z-order clustering, snapshot expiry + orphan GC
  (Iceberg maintenance the reference relies on but does not implement)

Everything is expressed Ray-Data-first: `ray.data.Dataset` pipelines of
`map_batches` over zero-copy Arrow batches, actor pools for stateful writer
stages, explicit hash partitioning on `conv_id` with skew splitting for hot
keys. Metadata is Avro-free JSON (manifests + snapshot log); data is Parquet.
"""

from raylake.core.compat import ensure_fsspec_http_importable

ensure_fsspec_http_importable()  # thread-safe Ray Data reads, see compat.py

from raylake.core.table import Table, CommitConflictError  # noqa: F401
from raylake.core.schema import TRANSCRIPT_SCHEMA  # noqa: F401
from raylake.core.catalog import Catalog  # noqa: F401
from raylake.core.transaction import CatalogTransaction  # noqa: F401

__version__ = "0.1.0"
