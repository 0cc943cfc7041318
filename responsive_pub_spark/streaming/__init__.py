"""Streaming layer: stateful PAPI processors, runtime helpers, async stage,
multimodal column plumbing (SURVEY.md §2.6, §2.8, §3.3)."""
