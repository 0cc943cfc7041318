"""Runnable example topologies — the analog of the reference's
kafka-client-examples module:

- simple count (simple-example/.../SimpleApplication): one line here —
  ``Pipeline(spark).stream(df, key).group_by_key().count()``
- :mod:`stjoin` — the e2e regression flagship (STJoinExample.java):
  stream-table join + windowed reduce
- :mod:`key_batch` — KeyBatchExample.java: per-key event batching flushed
  by a stream-time punctuator over stored state
"""
