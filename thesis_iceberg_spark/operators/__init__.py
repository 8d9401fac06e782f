"""Reusable operator implementations (multimodal, similarity building blocks)."""
