from robosat_tpu.graph.core import UndirectedGraph  # noqa: F401
