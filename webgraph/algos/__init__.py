"""Iterative graph analytics (north_rule): PageRank, connected components,
label propagation, triangle counting — DataFrame joins + hash aggregates
with explicit partitioning, skew salting, per-iteration checkpoints."""

from webgraph.algos.common import encode_graph  # noqa: F401
from webgraph.algos.bfs import bfs_depths  # noqa: F401
from webgraph.algos.cocitation import cocitation, coupling  # noqa: F401
from webgraph.algos.components import connected_components  # noqa: F401
from webgraph.algos.labelprop import label_propagation  # noqa: F401
from webgraph.algos.hits import hits  # noqa: F401
from webgraph.algos.kcore import k_core  # noqa: F401
from webgraph.algos.pagerank import (  # noqa: F401
    pagerank,
    personalized_pagerank,
    spam_mass,
)
from webgraph.algos.bowtie import bowtie  # noqa: F401
from webgraph.algos.scc import strongly_connected_components  # noqa: F401
from webgraph.algos.triangles import triangle_count  # noqa: F401
