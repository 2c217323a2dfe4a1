"""Large-scale training-data pipeline operators (beyond-reference mandate):
deduplication, similarity search, text analysis, multimodal columns.

All operators are built DataFrame-first: candidate generation via inverted
indexes / LSH banding (never O(n²) cross joins), verification as equi-joins,
text features as codegen'd Column expressions reproducible in ANSI SQL.
"""
