"""geos_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the query/data-processing capabilities of GEOS
(reference: pramsey/geos) as an idiomatic Spark engine:

- numpy/Arrow vectorized geometry kernels (``geos_spark.kernels``)
- ``st_*`` column functions backed by pandas UDFs (``geos_spark.functions``)
- distributed operators: ``spatial_join``, ``knn_join``, ``tile``
  (``geos_spark.operators``)
- deterministic Common-Crawl-style pages source (``geos_spark.sources``)

No code is copied from the reference; semantics are re-derived from its
documented behavior (citations in each module's docstring).
"""

__version__ = "0.1.0"

from geos_spark.session import get_spark  # noqa: F401
