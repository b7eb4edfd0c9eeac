from paragrapher_spark.kernels.degrees import (
    degree_distribution,
    in_degrees,
    out_degrees,
)
from paragrapher_spark.kernels.pagerank import pagerank

__all__ = ["degree_distribution", "in_degrees", "out_degrees", "pagerank"]
