from .explain import (formatted_plan, has_broadcast_hash_join,
                      has_shuffle, pushed_filters, read_schema_columns,
                      whole_stage_codegen_spans)

__all__ = ["formatted_plan", "has_broadcast_hash_join", "has_shuffle",
           "pushed_filters", "read_schema_columns",
           "whole_stage_codegen_spans"]
