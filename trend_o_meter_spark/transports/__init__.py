"""Transport adapters: the reference's real I/O, executable here.

The reference's only store is Redis — a bounded ``LRANGE`` backfill scan
(trend-o-meter:289), a ``PSUBSCRIBE`` live stream (trend-o-meter:446),
and the pub/sub firehose + C2 channels (trend-o-meter:528,165-169).
This package makes that transport REAL without any external dependency:
:mod:`.resp` speaks the public RESP2 wire protocol, and
:mod:`.redis_source` turns it into catalog-pluggable readers
(``catalog.register_source``) so every operator runs unchanged over a
live Redis instead of parquet snapshots.  Tests drive the whole path
against an in-process mock server speaking genuine RESP bytes.
"""

from . import c2_bridge, redis_source, resp  # noqa: F401
