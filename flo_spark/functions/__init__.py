from flo_spark.functions.glob import GlobError, glob_to_regex, namespace_matches

__all__ = ["GlobError", "glob_to_regex", "namespace_matches"]
