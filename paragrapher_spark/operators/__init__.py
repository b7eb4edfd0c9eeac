from paragrapher_spark.operators.indexing import dense_ids, prefix_sum
from paragrapher_spark.operators.salting import explode_salts, salt_column

__all__ = ["dense_ids", "prefix_sum", "salt_column", "explode_salts"]
