from tensorflow_probability.python import distributions  # noqa: F401
