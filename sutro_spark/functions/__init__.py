from sutro_spark.functions.prompt import concat_prompt, labeled_concat, normalize_output_schema

__all__ = ["concat_prompt", "labeled_concat", "normalize_output_schema"]
