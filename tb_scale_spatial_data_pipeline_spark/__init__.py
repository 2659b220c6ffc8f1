"""PySpark-native analytics engine with the query & data-processing
capabilities of ``YeZixiong123/TB-Scale-Spatial-Data-Pipeline``.

The reference (at ``/root/reference``) is a four-stage geospatial batch
pipeline (feature stacking, pixel RF classification, tiled segmentation,
object classification). This package re-expresses its operator surface —
relational core, tiled raster kernels, ML inference — as idiomatic
Spark DataFrame/SQL programs designed for 100 TB scale, plus the
north-star LLM-data-pipeline extensions (dedup, similarity search,
multimodal columns, text analysis, structured streaming).

Layout:
    sources/    parquet catalog + table loaders
    functions/  scalar/column expressions (spectral indices, sentinels,
                text analysis, vector math)
    operators/  composed relational operators (composites, joins,
                dedup, similarity, relabeling, windows)
    raster/     tile tables, halo exchange, pandas-UDF kernels
    ml/         Spark ML training/inference (dual-model fallback)
    plans/      the reference's four pipelines as DataFrame programs
    streaming/  Structured Streaming ops over the events table
"""

__version__ = "0.1.0"
