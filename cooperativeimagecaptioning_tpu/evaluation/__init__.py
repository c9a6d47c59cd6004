"""Evaluation stack: eval_split, retrieval ranking, language metrics driver."""
