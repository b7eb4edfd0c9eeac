from paragrapher_spark.functions.extract import extract_import_keys, IMPORT_PATTERNS

__all__ = ["extract_import_keys", "IMPORT_PATTERNS"]
