"""nimhdfstore_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of rolandgg/nimHDFStore, re-expressed Spark-first.

The reference (/root/reference, studied for behavior only) is a typed, embedded
HDF5 table store: a keyed catalog of record tables with positional reads
(point / slice / strided hyperslab / coordinate set), mutation by row position
(append / insert / update / delete), attributes, and compression
(reference: nimtables.nim:13-236).

This package maps that surface onto Spark DataFrames:

- ``Store`` / ``Table``   — keyed catalog of Parquet-backed tables with a
  maintained ``_rowid`` position column (store.py).
- positional algebra      — slice/hyperslab/point-set compiled to ``_rowid``
  predicates that Catalyst pushes down to Parquet row-group pruning
  (operators/positional.py).
- mutation-as-rewrite     — deterministic snapshot rewrite + catalog pointer
  swap (store.py).
- extensions              — dedup, similarity search, text analysis,
  multimodal columns, structured streaming (operators/, streaming/).
"""

from nimhdfstore_spark.store import Store, StoreConflictError, StoreError, Table

__all__ = ["Store", "StoreConflictError", "StoreError", "Table"]
__version__ = "0.1.0"
