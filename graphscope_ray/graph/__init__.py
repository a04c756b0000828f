"""Graph core: dense vertex ids, partitioned edge store, BSP engine.

The reference holds one *fragment* per MPI worker (edge-cut partition,
CSR both ways, vertex map with fid packed in gid high bits —
``/root/reference/analytical_engine/core/fragment/arrow_projected_fragment.h:431``,
``core/vertex_map/arrow_projected_vertex_map.h:89``). Here the
equivalents are:

- dense vertex ids = rank of the oid in global sorted order
  (partition-count-independent, monotonic in oid → min-vid labeling
  equals min-oid labeling);
- partition ``p`` owns vids ``{p, p+P, p+2P, ...}``; local index =
  ``vid // P`` (dense per partition by construction — no bit packing);
- edges hash-partitioned by source vid into hive-partitioned Parquet
  (``edges/part=<p>/``), each partition actor loading its shard and
  laying edges out sorted by ``(dst % P, dst)`` with precomputed
  group boundaries so per-destination combining is one
  ``reduceat`` — the analogue of the reference's resident CSR.
"""

from graphscope_ray.graph.ids import assign_dense_ids, attach_vids  # noqa: F401
from graphscope_ray.graph.build import build_graph, GraphStore  # noqa: F401
from graphscope_ray.graph.engine import BSPEngine  # noqa: F401
from graphscope_ray.graph.api import (  # noqa: F401
    Graph,
    degree_assortativity,
)
from graphscope_ray.graph.node2vec import node2vec_walks  # noqa: F401
