"""Extension operators (SURVEY.md §2.C + BASELINE.json north star):
fuzzy/near dedup, similarity search, multimodal columns — the
LLM-training-data-pipeline surface the reference never had.
"""
