"""raquet_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the RaQuet raster-in-Parquet format
(reference: CartoDB/raquet), plus large-scale training-data pipeline
operators (dedup, similarity search, multimodal columns, text analysis).

Everything is expressed Spark-first: declarative DataFrame/SQL plans,
Catalyst-optimizable quadbin Column expressions, Arrow-batched Pandas
UDFs only for binary pixel codecs.
"""

__version__ = "0.1.0"
