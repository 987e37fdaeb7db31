from geos_spark.operators.spatial_join import (  # noqa: F401
    pip_refine,
    point_in_polygon_join,
)
