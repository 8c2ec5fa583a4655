"""curies_spark: a PySpark-native KG-construction engine with curies semantics."""

__version__ = "0.1.0"
