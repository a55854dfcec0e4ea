"""grepai_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch reinterpretation of yoanbernabeu/grepai (local semantic-search +
call-graph indexer, Go) as a distributed triple factory over transcript tables:

  transcripts(conv_id, turn_idx, role, text, tool, ts)
    -> EXTRACT   (vectorized mention detection + tool-invocation rows)
    -> EMBED     (batched deterministic encoder + content-hash cache)
    -> LINK      (broadcast alias dictionary + blocked Jaccard similarity join)
    -> CANON     (large-star/small-star connected components)
    -> MATERIALIZE (vertices / (subj, pred, obj) edge tables)

Everything is expressed on the public DataFrame API so Catalyst handles
pushdown/pruning/join planning; the only Python on the hot path is Arrow-batched
pandas UDFs (mention detector, encoder). See SURVEY.md for the operator-by-operator
mapping with reference citations.
"""

__version__ = "0.1.0"
