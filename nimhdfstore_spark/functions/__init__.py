from nimhdfstore_spark.functions.vector import cosine, dot, l2_norm  # noqa: F401
