"""pyofs_spark — a PySpark-native spatial-join + tiling engine.

Brand-new engine with the query and data-processing capabilities of the
reference (noaa-ocs-modeling/PyOFS, a single-process xarray/numpy NetCDF
converter), re-expressed Spark-first over web-scale tables:

- hierarchical cell indexing (H3/S2-style quad cells) of geocoded pages
  (ref analog: grid i/j cell addressing, PyOFS/model/wcofs.py:765-784)
- point-in-polygon joins against study-area polygons
  (ref: PyOFS/observation/data_buoy.py:301-323)
- kNN station lookup (ref: station layers hf_radar.py:198-252 + the
  validation regrid main/validation/data_assimilation_validation.py:149-207)
- nearest / bilinear regrid as cell-range joins
  (ref: wcofs.interpolate_grid, PyOFS/model/wcofs.py:1791-1827)
- time alignment: as-of joins, daily resample, compose-latest
  (ref: rtofs.py:263-268, viirs.py:660-667)
- derived fields: vector rotation, dir/mag, SSES bias, Kelvin→C
  (ref: wcofs.py:371-396,629-633; viirs.py:319-375)
- training-data pipeline ops over documents/embeddings: dedup (exact,
  minhash-LSH, simhash, n-gram jaccard), ANN similarity, text quality,
  language id, fingerprinting.

Everything is DataFrame/Catalyst-first; Python appears only in
Arrow-vectorized pandas UDFs for kernels Spark can't express natively.
"""

__version__ = "0.1.0"

NODATA = -9999.0  # sentinel at raster sinks (ref: PyOFS/__init__.py:20)
WGS84_EPSG = 4326
WEB_MERCATOR_EPSG = 3857
