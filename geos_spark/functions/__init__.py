"""Column-level engine functions.

Two tiers, per the engine's execution contract:

- **native**: pure ``pyspark.sql`` Column expressions (JVM-side,
  whole-stage-codegen'd). The Hilbert cell code is native — the
  bitwise algorithm runs entirely inside Tungsten, so tile assignment
  of 10^12 rows never crosses the Arrow boundary.
- **pUDF**: vectorized pandas UDFs over Arrow batches (numpy kernels)
  for geometry refinement, codecs, and envelope math that SQL cannot
  express.
"""

from geos_spark.functions.hilbert_native import (  # noqa: F401
    with_hilbert_cell,
    with_tile_cell,
)
from geos_spark.functions.st import (  # noqa: F401
    st_area,
    st_astext,
    st_centroid_x,
    st_centroid_y,
    st_envelope_struct,
    st_geomfromtext,
    st_length,
    st_tile_cells,
)
