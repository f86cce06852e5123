"""kgw_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch reimplementation of the *capabilities* of robert-haas/kgw
(reference at /root/reference, studied for semantics only): staged
extract → transform → merge KG construction over a source-code corpus
table ``(repo, path, commit, lang, content)``, emitting canonical
``(subj, pred, obj)`` triples into a unified property-graph store

    nodes (id string, type string, properties string/*JSON*/)
    edges (source_id string, target_id string, type string, properties string)

(reference schema: kgw/_shared/transform.py:10-30), plus the analytics
and export surface of the reference (kgw/_shared/load.py) re-expressed
as Catalyst-planned DataFrame jobs.

Architecture is Spark-first, not a port:

- extraction   = vectorized pandas/Arrow UDFs over content partitions
- linking      = broadcast dictionary join + salted skew join
- canonicalize = connected-components via iterative DataFrame self-joins
- materialize  = partitioned table store with atomic commits, lineage,
                 per-partition metrics, and checkpoint/resume
"""

__version__ = "0.1.0"

from kgw_spark.session import get_spark  # noqa: F401
