"""Pure-Python grid algebra: windows, affine transforms, cell codecs, geometry.

No Spark imports here — this package is shared by driver-side planning,
pandas UDF internals, and the pytest oracles.
"""

from rasterio_spark.grid.affine import Affine, IDENTITY
from rasterio_spark.grid.windows import Window, WindowError

__all__ = ["Affine", "IDENTITY", "Window", "WindowError"]
