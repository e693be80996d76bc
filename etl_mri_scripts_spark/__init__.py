"""etl_mri_scripts_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of the
reference MRI super-resolution ETL pipeline (MatheusSerraoBotto/etl-mri-scripts,
surveyed in SURVEY.md), re-expressed Spark-first:

- relational core (scans, joins, aggregations, sorts, set ops, splits) as
  Catalyst-optimizable DataFrame plans;
- the imaging dataflow (slice explode -> degradation -> patch extraction ->
  dark filter -> key-parity joins -> partitioned sink) as one DataFrame
  lineage with Arrow pandas UDFs for the pixel kernels;
- large-scale training-data operators (dedup, similarity search, text
  analysis, multimodal columns) designed for 100 TB / 1000-executor scale.
"""

__version__ = "0.1.0"
