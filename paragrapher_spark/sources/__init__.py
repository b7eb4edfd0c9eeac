from paragrapher_spark.sources.corpus import synth_corpus
from paragrapher_spark.sources.edges import (
    copurchase_edges,
    customer_order_edges,
    load_table,
)

__all__ = [
    "synth_corpus",
    "copurchase_edges",
    "customer_order_edges",
    "load_table",
]
