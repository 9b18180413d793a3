from burla_spark.functions.numeric import dec, money_sum, money_avg
from burla_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = ["dec", "money_sum", "money_avg", "cosine_similarity", "dot", "l2_norm"]
