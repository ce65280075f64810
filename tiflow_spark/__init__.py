"""tiflow_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch rebuild, in idiomatic Spark, of the *capabilities* of
wk989898/tiflow (TiCDC + DM): tail a binlog/WAL-style change stream of
insert/update/delete events, totally order them per key by commit
timestamp, decode versioned payloads against a schema registry, and apply
them exactly-once-in-effect to a lake table, resumable from a checkpoint.

Pipeline (reference: puller → sorter → mounter → sink,
/root/reference/cdc/processor/*):

    readStream(change events)                      # puller
      → resolved-ts frontier                       # puller/frontier
      → salted repartition on the identity key     # causality / hot-span split
      → versioned payload decode                   # mounter
      → commit-ts-ordered LWW dedup window         # sorter + DM compactor
      → conditional MERGE into a bucketed COW      # mysql/cloudstorage sink
        parquet table (atomic manifest commit,
        epoch fencing, tombstoned deletes)
      → lineage metrics append                     # syncpoint / progress tracker

No custom Catalyst rules; everything is plain DataFrame logic plus one
vectorized pandas UDF (the mounter analog).
"""

__version__ = "0.1.0"
