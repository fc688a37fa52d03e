from axolotls_spark.functions.scalar import fill_null, logit, safe_div, safe_log
from axolotls_spark.functions.struct_ops import fill_null_frame, map_numeric_fields
from axolotls_spark.functions.arrays import cosine, dot, norm, transform

__all__ = [
    "fill_null",
    "logit",
    "safe_div",
    "safe_log",
    "fill_null_frame",
    "map_numeric_fields",
    "cosine",
    "dot",
    "norm",
    "transform",
]
